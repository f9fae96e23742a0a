"""A/B the per-pair optimization OBJECTIVE against ground truth.

Round-5 measurement chain (RESULTS/r5_optreg_objective_ab.log): on the
anatomical phantom, per-pair optreg with unmasked global NCC converges
(sim 0.008 -> 0.001) yet recovers only ~35% of the GT field energy
(basis residual 0.80-0.81 at 48^3/96^3). Cause: after the HU clip the
volume is dominated by the air(-1)/body(+1) contrast, so intra-lung
texture (~0.12 amplitude around -0.7) carries ~(0.12/0.85)^2 = 2% of
global NCC's gradient - the optimizer is nearly blind exactly where the
correspondence (and every landmark) lives. The classical lung-CT fix is
windowed similarity: LNCC normalizes contrast per window, giving the
lung interior its volume-share of the gradient.

This tool measures each objective's recovered-field error directly:
  rel_err = ||disp_opt - disp_gt|| / ||disp_gt||   (per pair, L2)
for sim in {ncc, lncc} x {unmasked, lung-masked} volumes.

Usage: python tools/optreg_objective_ab.py --data DIR [--n 4]
       [--levels 10:80:0.04,20:80:0.02] [--size 96]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, "tests", ".jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from liftreg_tpu.data.dataset import normalize_intensity  # noqa: E402
from liftreg_tpu.optreg import DenseRegisterer  # noqa: E402
from tools.basis_oracle import gt_disp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", required=True)
    ap.add_argument("--phase", default="train")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--levels", default="10:80:0.04,20:80:0.02")
    ap.add_argument("--variants", default="ncc,lncc,ncc_masked,lncc_masked")
    args = ap.parse_args(argv)

    levels = tuple(tuple(float(x) if i == 2 else int(x)
                         for i, x in enumerate(lv.split(":")))
                   for lv in args.levels.split(","))
    ids = np.load(os.path.join(args.data, args.phase, "data_id.npy"),
                  allow_pickle=True)[:args.n]
    pre = os.path.join(args.data, "preprocessed")

    def _vol(cid, side):
        v = np.flip(np.load(os.path.join(pre, f"{cid}_{side}.npy"))
                    .astype(np.float32), axis=1)
        return normalize_intensity(v, linear_clip=True,
                                   clip_range=(-1000, 0))[None, None]

    def _seg(cid, side):
        return np.flip(np.load(os.path.join(
            pre, f"{cid}_{side}_seg.npy")).astype(np.float32),
            axis=1)[None, None]

    moving = np.concatenate([_vol(c, "source") for c in ids])
    target = np.concatenate([_vol(c, "target") for c in ids])
    m_seg = np.concatenate([_seg(c, "source") for c in ids])
    t_seg = np.concatenate([_seg(c, "target") for c in ids])
    img_sz = moving.shape[2:]
    gt = np.stack([gt_disp(args.data, c).reshape(-1)
                   for c in ids])  # (N, 3*D*W*H)
    gt_norm = np.linalg.norm(gt, axis=1)

    B = len(ids)
    results = {}
    for variant in args.variants.split(","):
        sim = "lncc" if variant.startswith("lncc") else "ncc"
        if variant.endswith("_masked"):
            mv = (moving + 1.0) * m_seg - 1.0
            tv = (target + 1.0) * t_seg - 1.0
        else:
            mv, tv = moving, target
        reg = DenseRegisterer(img_sz, sim=sim, levels=levels,
                              warp_taps_dtype=jnp.bfloat16)
        out = reg(jnp.asarray(mv), jnp.asarray(tv))
        disp = np.asarray(out["disp"], np.float32).reshape(B, -1)
        sims = np.asarray(out["sim_history"])
        rel = np.linalg.norm(disp - gt, axis=1) / np.maximum(gt_norm, 1e-9)
        results[variant] = rel
        print(f"{variant:<12} sim {sims[0]:.4f}->{sims[-1]:.4f}  "
              f"rel_err/pair {' '.join(f'{r:.3f}' for r in rel)}  "
              f"mean {rel.mean():.3f}", flush=True)
    best = min(results, key=lambda k: results[k].mean())
    print(f"BEST: {best} (mean rel_err {results[best].mean():.3f})")
    return results


if __name__ == "__main__":
    main()
