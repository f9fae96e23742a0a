"""Golden tests for losses vs torch implementations of the reference specs."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from liftreg_tpu import losses


def torch_ncc_loss(x, y):
    # spec of layers/losses.py:14-29
    x = x.view(x.shape[0], -1)
    y = y.view(y.shape[0], -1)
    xm = x - torch.mean(x, 1).view(x.shape[0], 1) + 1e-10
    ym = y - torch.mean(y, 1).view(x.shape[0], 1) + 1e-10
    ncc = ((xm * ym).mean(1)) / torch.sqrt((xm ** 2).mean(1) * (ym ** 2).mean(1))
    return 1 - ncc.mean()


def torch_ncc_sqr_loss(x, y):
    # spec of layers/layers.py:238-255
    n = x.shape[0]
    shape = [x.shape[0], x.shape[1], -1] + [1] * (x.dim() - 2)
    x = x.view(*shape)
    y = y.view(*shape)
    xm = x - x.mean(dim=2, keepdim=True)
    ym = y - y.mean(dim=2, keepdim=True)
    ncc2 = ((xm * ym).mean(dim=2) ** 2) / ((xm ** 2).mean(dim=2) * (ym ** 2).mean(dim=2) + 1e-12)
    return 1 - ncc2.mean(dim=1).sum() / n


def test_ncc_matches():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 1, 6, 7, 8)).astype(np.float32)
    y = (0.5 * x + 0.2 * rng.normal(size=x.shape)).astype(np.float32)
    want = torch_ncc_loss(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(losses.ncc_loss(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, abs=1e-6)


def test_ncc_sqr_matches():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 6, 7, 8)).astype(np.float32)
    y = rng.normal(size=x.shape).astype(np.float32)
    want = torch_ncc_sqr_loss(torch.from_numpy(x), torch.from_numpy(y)).item()
    got = float(losses.ncc_sqr_loss(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, abs=1e-5)


def test_ncc_perfect_match_is_zero():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 1, 5, 5, 5)).astype(np.float32)
    assert float(losses.ncc_loss(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(0.0, abs=1e-6)
    assert float(losses.lncc_loss(jnp.asarray(x), jnp.asarray(x))) < 0.05


def test_ngf_matches_reference_spec():
    # independent check: identical images -> loss ~ 0 (unit gradients align)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1, 12, 13)).astype(np.float32)
    val = float(losses.ngf_loss(jnp.asarray(x), jnp.asarray(x)))
    assert val == pytest.approx(0.0, abs=1e-4)
    y = rng.normal(size=x.shape).astype(np.float32)
    assert float(losses.ngf_loss(jnp.asarray(x), jnp.asarray(y))) > 0.3


def test_sigmoid_decay_values():
    # spec: utils/utils.py:93-107
    assert losses.sigmoid_decay(0, static=5, k=5) == 1.0
    assert losses.sigmoid_decay(4, static=5, k=5) == 1.0
    for ep in [5, 7, 20]:
        want = 5 / (5 + np.exp((ep - 5) / 5))
        assert losses.sigmoid_decay(ep, static=5, k=5) == pytest.approx(want)


def test_reg_factor_schedule():
    sched = losses.RegFactorSchedule(initial=0.01, minimum=0.01, decay_from=2)
    # with min == initial the factor is pinned at the minimum
    assert sched(0) == pytest.approx(0.01)
    assert sched(100) == pytest.approx(0.01)
    sched2 = losses.RegFactorSchedule(initial=10, minimum=1e-3, decay_from=10)
    assert sched2(0) == pytest.approx(10.0)
    assert sched2(50) < 1e-2 + 1e-3 or sched2(50) >= 1e-3


def test_displacement_reg_against_manual():
    rng = np.random.default_rng(4)
    disp = rng.normal(size=(2, 3, 6, 7, 8)).astype(np.float32) * 0.1
    got = float(losses.displacement_reg(jnp.asarray(disp)))
    # manual: central diff with replicate boundary, spacing 2/(N-1)
    total = np.zeros(disp.shape[0:1] + disp.shape[2:], dtype=np.float64)
    for c in range(3):
        f = disp[:, c].astype(np.float64)
        for ax, n in zip((1, 2, 3), f.shape[1:]):
            h = 2.0 / (n - 1)
            idx_p = np.clip(np.arange(1, n + 1), 0, n - 1)
            idx_m = np.clip(np.arange(-1, n - 1), 0, n - 1)
            d = (np.take(f, idx_p, axis=ax) - np.take(f, idx_m, axis=ax)) / (2 * h)
            total += d ** 2
    assert got == pytest.approx(total.mean(), rel=1e-5)


def test_subspace_loss_combines():
    rng = np.random.default_rng(5)
    out = {
        "warped": jnp.asarray(rng.normal(size=(2, 1, 6, 6, 6)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(2, 1, 6, 6, 6)).astype(np.float32)),
        "params": jnp.asarray(rng.normal(size=(2, 3, 6, 6, 6)).astype(np.float32)),
    }
    loss_fn = losses.SubspaceLoss({"sim_class": "ncc",
                                   "initial_reg_factor": 0.01,
                                   "min_reg_factor": 0.01,
                                   "reg_factor_decay_from": 2})
    factor = loss_fn.factor(epoch=0)
    res = loss_fn(out, factor)
    want = float(losses.ncc_loss(out["warped"], out["target"])) + \
        0.01 * float(losses.displacement_reg(out["params"]))
    assert float(res["total_loss"]) == pytest.approx(want, rel=1e-6)


def test_regnet_image_loss_uses_forward_field_only():
    """RegNetImageLoss (the CT-CT basis-building objective): sim on
    warped/target volumes, reg on the FORWARD displacement only — the
    inverse field must not contribute (it gets DCE'd in the jitted step)."""
    rng = np.random.default_rng(6)
    out = {
        "warped": jnp.asarray(rng.normal(size=(2, 1, 6, 6, 6)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(2, 1, 6, 6, 6)).astype(np.float32)),
        "params": [
            jnp.asarray(rng.normal(size=(2, 3, 6, 6, 6)).astype(np.float32)),
            jnp.asarray(np.full((2, 3, 6, 6, 6), np.nan, np.float32)),
        ],
    }
    loss_fn = losses.get_loss("regnet_image")({"sim_class": "ncc",
                                               "initial_reg_factor": 0.01,
                                               "min_reg_factor": 0.01,
                                               "reg_factor_decay_from": 2})
    res = loss_fn(out, loss_fn.factor(epoch=0))
    want = float(losses.ncc_loss(out["warped"], out["target"])) + \
        0.01 * float(losses.displacement_reg(out["params"][0]))
    assert float(res["total_loss"]) == pytest.approx(want, rel=1e-6)
    assert np.isfinite(float(res["total_loss"]))  # NaN inverse never read


def test_lncc_smooth_preserves_constants_and_descends():
    """smooth= pre-filter: exact boundary normalization + plumbing.

    The triangle pre-filter must preserve a constant image exactly
    (including boundary voxels, where a naive SAME-padded box sum
    attenuates), and smooth=0 must be byte-identical to the default path.
    """
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 1, 9, 9, 9)).astype(np.float32)
    # constant preservation (exact per-voxel weights)
    const = jnp.full((1, 1, 9, 9, 9), 3.25, jnp.float32)
    sm = losses.similarity._smooth_triangle(const, 3)
    np.testing.assert_allclose(np.asarray(sm), 3.25, rtol=1e-6)
    # smooth=0 is the default path
    a = float(losses.lncc_loss(jnp.asarray(x), jnp.asarray(x), smooth=0))
    b = float(losses.lncc_loss(jnp.asarray(x), jnp.asarray(x)))
    assert a == b
    # smoothing both images keeps self-similarity near the floor
    c = float(losses.lncc_loss(jnp.asarray(x), jnp.asarray(x), smooth=3))
    assert np.isfinite(c) and 0.0 <= c <= 1.0


def test_sim_opts_plumbs_kwargs_into_similarity():
    from liftreg_tpu.losses.registration import SubspaceLoss
    rng = np.random.default_rng(8)
    out = {
        "warped": jnp.asarray(rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)),
        "params": jnp.asarray(rng.normal(size=(2, 3, 8, 8, 8)).astype(np.float32)),
    }
    base = SubspaceLoss({"sim_class": "lncc"})
    opted = SubspaceLoss({"sim_class": "lncc", "sim_opts": {"win": 5, "smooth": 3}})
    v0 = float(base(out, 0.0)["sim_loss"])
    v1 = float(opted(out, 0.0)["sim_loss"])
    want = float(losses.lncc_loss(out["warped"], out["target"], win=5, smooth=3))
    assert v1 == pytest.approx(want, rel=1e-6)
    assert v0 != pytest.approx(v1, rel=1e-4)


def test_lncc_multiscale_extends_capture_radius():
    """scales=[1,2,4] must rank a large (beyond-window) misalignment worse
    than a small one — the capture-radius failure single-scale win-9 LNCC
    has at 160^3 (DEMO.md 'LNCC on the vascular set'). Built from smooth
    broadband-ish texture shifted by 2 vs 8 voxels."""
    rng = np.random.default_rng(9)
    n = 48
    base = rng.normal(size=(n + 16, n + 16, n + 16)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(base, 3.0)
    crop = lambda off: jnp.asarray(
        base[8 + off:8 + off + n, 8:8 + n, 8:8 + n])[None, None]
    tgt = crop(0)
    ms = {off: float(losses.lncc_loss(crop(off), tgt, scales=(1, 2, 4),
                                      smooth=3)) for off in (0, 2, 8)}
    assert ms[0] < ms[2] < ms[8], ms
    # scales=[1] is byte-identical to the single-scale path
    a = float(losses.lncc_loss(crop(2), tgt, scales=[1], smooth=3))
    b = float(losses.lncc_loss(crop(2), tgt, smooth=3))
    assert a == b
    # plumbs through sim_opts like any other kwarg
    from liftreg_tpu.losses.registration import SubspaceLoss
    out = {"warped": crop(2), "target": tgt,
           "params": jnp.zeros((1, 3, n, n, n), jnp.float32)}
    opted = SubspaceLoss({"sim_class": "lncc",
                          "sim_opts": {"scales": [1, 2], "smooth": 3}})
    v = float(opted(out, 0.0)["sim_loss"])
    want = float(losses.lncc_loss(crop(2), tgt, scales=[1, 2], smooth=3))
    assert v == pytest.approx(want, rel=1e-6)


def test_lncc_smooth_rejects_even_and_fractional_widths():
    x = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    for bad in (2, 4, 2.5, 0.5, -3):
        with pytest.raises(ValueError):
            losses.lncc_loss(x, x, smooth=bad)
