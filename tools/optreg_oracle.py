"""Per-pair oracle: does per-pair optimization recover the TRUE field?

``build_pca --from_optreg`` assumes classical per-pair optimization
(:class:`liftreg_tpu.optreg.DenseRegisterer`) recovers deformations close
to the ground-truth correspondence. That assumption is texture-dependent:
on the vascular set the registered fields aligned images to sim 0.01 yet
the resulting basis left 0.78 of the GT deformation unexplained and the
stage-3 model evaluated at TRE 20.5 mm vs identity 8.3 (vessel-permutation
minima: self-similar branches map onto the WRONG branch with a large,
smooth, image-aligning warp).

This tool measures that failure mode directly, per pair and BEFORE any
PCA/stage-3 spend: it registers N pairs of a split and reports the
relative L2 error of the recovered displacement against the generator's
ground truth (``gt_phi``), plus RMS magnitudes in mm. rel err ~0 means the
texture pins true correspondence; rel err >~1 means image-aligning but
correspondence-wrong fields (a basis built from them is poison).

The reference has no counterpart (it consumes a prebuilt basis,
``README.md:34-36``, and ships no basis-quality tooling).

Usage: python tools/optreg_oracle.py --data DIR [--phase train] [--n 3]
       [--levels 10:80:0.04,20:60:0.02,40:60:0.01] [--spacing 2.2]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.basis_oracle import gt_disp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", required=True)
    ap.add_argument("--phase", default="train")
    ap.add_argument("--n", type=int, default=3, help="pairs to register")
    ap.add_argument("--levels", type=str, default="",
                    help="grid:steps:lr,... (DenseRegisterer default)")
    ap.add_argument("--sim", type=str, default="ncc")
    ap.add_argument("--spacing", type=float, default=2.2)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from liftreg_tpu.data.dataset import normalize_intensity
    from liftreg_tpu.optreg import DenseRegisterer

    ids = np.load(os.path.join(args.data, args.phase, "data_id.npy"),
                  allow_pickle=True)[:args.n]
    pre = os.path.join(args.data, "preprocessed")

    def _vol(case_id, side):
        v = np.flip(np.load(os.path.join(pre, f"{case_id}_{side}.npy"))
                    .astype(np.float32), axis=1)
        return normalize_intensity(v, linear_clip=True,
                                   clip_range=(-1000, 0))[None, None]

    probe = _vol(ids[0], "source")
    img_sz = probe.shape[2:]
    to_mm = (img_sz[0] - 1) / 2.0 * args.spacing
    kw = {}
    if args.levels:
        kw["levels"] = tuple(tuple(float(x) for x in lv.split(":"))
                             for lv in args.levels.split(","))
    reg = DenseRegisterer(img_sz, sim=args.sim,
                          warp_taps_dtype=jnp.bfloat16, **kw)

    print(f"{'case':<10} {'rel err':>8} {'|gt| mm':>8} {'|pred| mm':>9} "
          f"{'err mm':>8} {'sim0->simN':>12}", flush=True)
    rels = []
    for cid in ids:
        out = reg(jnp.asarray(_vol(cid, "source")),
                  jnp.asarray(_vol(cid, "target")))
        pred = np.asarray(out["disp"][0], np.float64).reshape(-1)
        gt = gt_disp(args.data, cid).astype(np.float64).reshape(-1)
        rel = float(np.linalg.norm(pred - gt) / np.linalg.norm(gt))
        rms = lambda x: float(np.sqrt(np.mean(x ** 2))) * to_mm
        sims = np.asarray(out["sim_history"])
        rels.append(rel)
        print(f"{cid:<10} {rel:>8.4f} {rms(gt):>8.3f} {rms(pred):>9.3f} "
              f"{rms(pred - gt):>8.3f} {sims[0]:>6.4f}->{sims[-1]:.4f}",
              flush=True)
    print(f"{'mean':<10} {np.mean(rels):>8.4f}")
    return float(np.mean(rels))


if __name__ == "__main__":
    main()
