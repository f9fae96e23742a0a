"""Train-step throughput bench: ms/step for any model/config on a dataset.

The serving side has ``bench.py``; this is its training counterpart.
Builds the production ``RegistrationTrainer`` on a dataset with a chosen
model family and knobs, trains ``--epochs`` epochs into a throwaway exp
dir, then reports ``Train/step_time_ms`` from the trainer's own metrics
log (steady-state mean = mean over the last half of the flushes, so the
compile-inclusive first flush is excluded).

The round-4 use: A/B the ``model.fast_vjp`` no-re-gather warp VJP on the
dense RegNet2D3D stage (its inverse-flow iteration differentiates warps
wrt traced images — DESIGN.md section 3a scatter economics) before
committing the long paper-workflow stage-1 run to either path.

Usage:
  python tools/bench_train_step.py --data /root/broadband160_data \
      --model regnet2d3d --inverse_iters 2 --s2d [--fast_vjp] [--epochs 1]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", required=True)
    ap.add_argument("--model", default="regnet2d3d",
                    choices=("regnet2d3d", "subspace_backproj", "subspace"))
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--latent", type=int, default=16)
    ap.add_argument("--inverse_iters", type=int, default=2)
    ap.add_argument("--s2d", action="store_true")
    ap.add_argument("--fast_vjp", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the throwaway experiment dir")
    args = ap.parse_args(argv)

    from liftreg_tpu.train.trainer import RegistrationTrainer
    from liftreg_tpu.utils.settings import default_task_setting

    exp = tempfile.mkdtemp(prefix="bench_train_")
    s = default_task_setting(args.data, exp, args.size, overrides={
        "train": {
            "epoch": args.epochs,
            "model": {"latent_dim": args.latent, "s2d_encoder": args.s2d,
                      "fast_vjp": args.fast_vjp},
            "save_fig_frequency": 1000,
            "save_model_frequency": 1000,
            "log_flush_steps": 2,
        },
    })
    s["train"]["dataloader"]["batch_size"] = args.batch
    if args.model == "regnet2d3d":
        s["dataset"]["dataset_class"] = "registration2d3d_projloss"
        s["dataset"]["apply_hu_clip"] = False
        s["train"]["model_class"] = "regnet2d3d"
        s["train"]["loss_class"] = "regnet2d3d"
        s["train"]["model"] = {"drr_feature_num": 4,
                               "s2d_encoder": args.s2d,
                               "inverse_iters": args.inverse_iters,
                               "fast_vjp": args.fast_vjp}
        s["train"]["optim"]["lr"] = 5e-4

    print(f"model={args.model} fast_vjp={args.fast_vjp} "
          f"s2d={args.s2d} batch={args.batch} "
          f"inverse_iters={args.inverse_iters}", flush=True)
    RegistrationTrainer(s).run()

    log = os.path.join(exp, "logs", "metrics.jsonl")
    times = []
    with open(log) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "Train/step_time_ms":
                times.append(float(rec["value"]))
    steady = times[len(times) // 2:]
    mean = sum(steady) / max(1, len(steady))
    print(json.dumps({
        "metric": "train_step_time_ms",
        "value": round(mean, 1),
        "unit": "ms/step (steady-state)",
        "all_flushes_ms": [round(t, 1) for t in times],
        "fast_vjp": args.fast_vjp,
        "model": args.model,
    }), flush=True)
    if not args.keep:
        shutil.rmtree(exp, ignore_errors=True)


if __name__ == "__main__":
    main()
