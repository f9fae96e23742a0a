"""Build a PCA deformation-subspace basis.

The reference consumes a prebuilt ``pca_vectors.npy``/``pca_mean.npy``
(Drive download, ``README.md:34-36``) and ships no construction script.
This tool fits the basis from displacement fields, sourced either from

* a directory of saved displacement/phi ``.npy`` files
  (``--disp_dir``, accepts ``(3,D,W,H)`` displacement or [0,1] phi maps —
  phi maps are converted to displacements against the identity), or
* a trained dense-displacement model (e.g. RegNet2D3D) run over the
  training split (``--from_experiment``), the workflow the LiftReg paper
  describes for constructing the statistical deformation subspace, or
* classical per-pair optimization over the training split's CT pairs
  (``--from_optreg``, :class:`liftreg_tpu.optreg.DenseRegisterer`) —
  multi-level control-grid registration needing no trained model at all.
  This is how a statistical deformation model is bootstrapped when no
  dense network has converged yet (the paper's simulated pairs come with
  deformations from exactly this kind of classical registration).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liftreg_tpu import pca as pca_lib  # noqa: E402
from liftreg_tpu.coords import identity_map_np  # noqa: E402


def load_disp_fields(disp_dir):
    files = sorted(glob.glob(os.path.join(disp_dir, "*.npy")))
    assert files, f"no .npy files in {disp_dir}"
    fields = []
    idm = None
    for f in files:
        arr = np.load(f).astype(np.float32)
        assert arr.ndim == 4 and arr.shape[0] == 3, (f, arr.shape)
        if arr.min() >= 0.0 and arr.max() <= 1.0:
            # [0,1]-stored phi -> displacement in [-1,1] convention
            if idm is None:
                idm = identity_map_np(arr.shape[1:])
            arr = (arr * 2.0 - 1.0) - idm
        fields.append(arr.reshape(-1))
    return np.stack(fields)


def disp_from_experiment(data_path, exp_setting, phase="train"):
    """Run a trained model over a split (default: the *train* split — the
    paper fits the deformation subspace over training-pair displacement
    fields) and collect its predicted displacement fields."""
    from liftreg_tpu.data.dataset import DataLoader, get_dataset
    from liftreg_tpu.train import RegistrationTrainer
    from liftreg_tpu.utils.config import ParameterDict

    setting = ParameterDict()
    setting.load_JSON(exp_setting)
    setting["train"]["mode"] = "test"
    setting["train"]["test_from"] = os.path.join(
        setting["train"]["output_path"], "checkpoints", "model_best.ckpt")
    setting["dataset"]["data_path"] = data_path
    trainer = RegistrationTrainer(setting)
    # the test-mode trainer only builds a 'test' loader; build one for the
    # requested split with the same dataset options
    ds_setting = setting["dataset"]
    ds_opt = ds_setting.as_dict() if hasattr(ds_setting, "as_dict") \
        else dict(ds_setting)
    ds = get_dataset(ds_opt["dataset_class"])(data_path, phase=phase,
                                              option=ds_opt)
    loader = DataLoader(ds, batch_size=trainer.batch_size)
    fields = []
    for data in loader:
        batch, names = trainer.set_input(data, 0)
        _, out = trainer._eval_step(trainer.params, batch, trainer.pca)
        params = out.get("params")
        if isinstance(params, (list, tuple)):
            params = params[0]
        fields.extend(np.asarray(params).reshape(params.shape[0], -1)
                      [:len(names)])
    return np.stack(fields)


def disp_from_optreg(data_path, phase="train", levels=None, sim="ncc",
                     batch=2, verbose=True):
    """Register each (source, target) CT pair of a split by per-pair
    optimization (:class:`liftreg_tpu.optreg.DenseRegisterer`) and return
    the recovered displacement fields, (N, 3*D*W*H).

    Volumes are read and normalized exactly as the training dataset reads
    them (``data/dataset.py:_read_case``: axis-1 flip + linear HU clip to
    [-1000, 0]) so the basis lives in the same geometry the subspace model
    trains in.
    """
    import jax.numpy as jnp

    from liftreg_tpu.data.dataset import normalize_intensity
    from liftreg_tpu.optreg import DenseRegisterer

    ids = np.load(os.path.join(data_path, phase, "data_id.npy"),
                  allow_pickle=True)
    pre = os.path.join(data_path, "preprocessed")

    def _vol(case_id, side):
        v = np.flip(np.load(os.path.join(pre, f"{case_id}_{side}.npy"))
                    .astype(np.float32), axis=1)
        return normalize_intensity(v, linear_clip=True,
                                   clip_range=(-1000, 0))[None, None]

    probe = _vol(ids[0], "source")
    img_sz = probe.shape[2:]
    kw = {} if levels is None else {"levels": levels}
    reg = DenseRegisterer(img_sz, sim=sim, warp_taps_dtype=jnp.bfloat16,
                          **kw)
    fields = []
    for i in range(0, len(ids), batch):
        chunk = ids[i:i + batch]
        moving = np.concatenate([_vol(c, "source") for c in chunk])
        target = np.concatenate([_vol(c, "target") for c in chunk])
        if len(chunk) < batch:                    # pad to the jitted shape
            pad = batch - len(chunk)
            moving = np.concatenate([moving, moving[:pad]])
            target = np.concatenate([target, target[:pad]])
        out = reg(jnp.asarray(moving), jnp.asarray(target))
        disp = np.asarray(out["disp"][:len(chunk)], np.float32)
        if verbose:
            sims = np.asarray(out["sim_history"])
            print(f"  [{i + len(chunk):>3}/{len(ids)}] sim "
                  f"{sims[0]:.4f} -> {sims[-1]:.4f}", flush=True)
        fields.extend(disp.reshape(len(chunk), -1))
    return np.stack(fields)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--disp_dir", type=str, default="",
                    help="directory of (3,D,W,H) displacement/phi .npy files")
    ap.add_argument("--from_experiment", type=str, default="",
                    help="cur_task_setting.json of a trained dense model")
    ap.add_argument("--from_optreg", action="store_true",
                    help="register train pairs by per-pair optimization "
                         "(liftreg_tpu.optreg) instead of a trained model")
    ap.add_argument("--optreg_batch", type=int, default=2)
    ap.add_argument("--optreg_sim", type=str, default="ncc")
    ap.add_argument("--optreg_levels", type=str, default="",
                    help="grid:steps:lr,... e.g. 10:80:0.04,20:60:0.02")
    ap.add_argument("--data_path", type=str, default="")
    ap.add_argument("--out", "-o", required=True,
                    help="output folder for pca_vectors.npy / pca_mean.npy")
    ap.add_argument("--latent", "-l", type=int, default=56)
    args = ap.parse_args()

    if args.disp_dir:
        X = load_disp_fields(args.disp_dir)
    elif args.from_experiment:
        X = disp_from_experiment(args.data_path, args.from_experiment)
    elif args.from_optreg:
        levels = None
        if args.optreg_levels:
            levels = tuple(tuple(float(x) if i == 2 else int(x)
                                 for i, x in enumerate(lv.split(":")))
                           for lv in args.optreg_levels.split(","))
        X = disp_from_optreg(args.data_path or ".", levels=levels,
                             sim=args.optreg_sim, batch=args.optreg_batch)
    else:
        ap.error("one of --disp_dir / --from_experiment / --from_optreg "
                 "is required")

    latent = min(args.latent, X.shape[0])
    vectors, mean = pca_lib.fit_pca(X, latent)
    pca_lib.save_pca(args.out, vectors, mean)
    ratio = pca_lib.explained_variance_ratio(X, vectors, mean)
    print(f"PCA basis ({latent} components over {X.shape[0]} fields) "
          f"written to {args.out}; explained variance {ratio:.4f}")
