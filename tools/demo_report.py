"""Summarize a demo experiment: trained TRE vs identity baseline vs GT.

Runs the landmark TRE evaluation three ways over a synthetic dataset's test
split — with the experiment's saved phis, with the identity map, and with
the stored ground-truth maps — and prints a compact table.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liftreg_tpu.utils import tre  # noqa: E402


def eval_phi(data_path, cid, phi01, dim):
    src = tre.read_points(os.path.join(data_path, "landmarks",
                                       f"{cid}_300_eBH_xyz_r1.txt"))
    tgt = tre.read_points(os.path.join(data_path, "landmarks",
                                       f"{cid}_300_iBH_xyz_r1.txt"))
    prop = np.load(os.path.join(data_path, "preprocessed", f"{cid}_prop.npy"),
                   allow_pickle=True).item()
    origin = np.flip(np.asarray(prop["origin"])).copy()
    phi_spacing = np.flip(np.asarray(prop["spacing"])).copy()
    res, _, dists = tre.eval_with_data(src, tgt, phi01[None],
                                       np.full(3, float(dim)), phi_spacing,
                                       origin, phi_spacing)
    return res, dists


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", "-d", required=True)
    ap.add_argument("--exp_path", "-e", required=True)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    test_ids = [str(i) for i in
                np.load(os.path.join(args.data_path, "test", "data_id.npy"))]
    identity = tre.create_identity(np.full(3, args.dim))
    rows = []
    all_tre = {"identity": [], "trained": [], "ground_truth": []}
    for cid in test_ids:
        row = {"id": cid}
        row["identity"], d = eval_phi(args.data_path, cid, identity, args.dim)
        all_tre["identity"].extend(d)
        phi_file = os.path.join(args.exp_path, "tests", f"{cid}_phi.npy")
        if os.path.exists(phi_file):
            row["trained"], d = eval_phi(args.data_path, cid,
                                         np.load(phi_file), args.dim)
            all_tre["trained"].extend(d)
        gt_file = os.path.join(args.data_path, "gt_phi", f"{cid}_phi.npy")
        if os.path.exists(gt_file):
            row["ground_truth"], d = eval_phi(
                args.data_path, cid, np.load(gt_file).astype(np.float64),
                args.dim)
            all_tre["ground_truth"].extend(d)
        rows.append(row)

    hdr = ["id", "identity", "trained", "ground_truth"]
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(f"{r.get(k, float('nan')):.3f}"
                        if k != "id" else r[k] for k in hdr))
    print("---")
    for k, v in all_tre.items():
        if v:
            stats = tre.compute_tre_statistics(np.asarray(v))
            print(f"mean TRE {k}: {np.mean(v):.3f} mm  "
                  f"(p50 {stats['percentile_50']:.2f} / "
                  f"p95 {stats['percentile_95']:.2f} / GFR {stats['GFR']:.3f})")
