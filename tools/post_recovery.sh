#!/bin/bash
# One-shot executor for the post-outage runbook (tools/bench_ab.py
# docstring, items 1-8). Run this the moment the axon tunnel recovers:
#
#   bash tools/post_recovery.sh [--with-vascular] 2>&1 | tee /root/recovery_logs/driver.log
#
# Rules it enforces (memory: axon tunnel behavior):
#   * strictly sequential — never two TPU processes at once;
#   * generous timeouts — a timeout-killed TPU client extends the
#     degraded window, so budgets are sized to never fire on a healthy run;
#   * bench.py FIRST (the driver's must-win number; validates the
#     committed .jax_cache is still a hit for the current trace).
#
# The vascular 160^3 demo (item 8, ~50 min training) only runs with
# --with-vascular so the quick measurements land first.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOGS=/root/recovery_logs
mkdir -p "$LOGS"
cd "$REPO"

step() { # step <name> <timeout_s> <cmd...>
  local name="$1" budget="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) budget=${budget}s: $*"
  timeout "$budget" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  tail -n 25 "$LOGS/$name.log"
  echo "=== [$name] rc=$rc"
  return $rc
}

# 0. sanity: relay ports answer before burning any budget
if ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "relay ports closed — tunnel still dead, aborting"; exit 1
fi

# 1. the must-win: driver bench with the committed warm cache
step bench 900 python bench.py || true

# 2. stage-0 conv variants (the one op ~19x off its roofline)
step stage0 1800 python tools/bench_stage0.py || true

# 3. opt-in kernel A/B: serving then training
step ab 3600 python tools/bench_ab.py || true

# 4. (manual) if s2d/pca win in $LOGS/ab.log: flip pipeline defaults,
#    re-run bench.py to RE-WARM .jax_cache, commit cache + docs.
echo "=== review $LOGS/ab.log for s2d/pca flip decision (runbook item 4)"

# 5. refinement cost at 160^3 (image + CT-free domains)
step refine_time_img 2400 python tools/bench_refine.py --steps 30 || true
step refine_time_proj 2400 python tools/bench_refine.py --steps 30 \
    --domain projection || true

# 6. real-scale refinement TRE on the trained 160^3 demo
DEMO_SETTING=$(ls -d /root/demo_out2/*/*/*/cur_task_setting.json 2>/dev/null | head -1)
if [ -n "${DEMO_SETTING:-}" ]; then
  step refine_eval 3600 python tools/refine_eval.py -s "$DEMO_SETTING" \
      --steps 30 --iso_spacing 2.2 --domain projection || true
else
  echo "=== no /root/demo_out2 experiment found; skipping refine_eval"
fi

# 7. serving artifact: load + first-call (compile vs cache-hit) + steady state
if [ -f /tmp/flagship160.liftreg ]; then
  step artifact 1800 python tools/bench_refine.py \
      --artifact /tmp/flagship160.liftreg || true
else
  echo "=== /tmp/flagship160.liftreg missing; re-export with tools/export_serving.py"
fi

# 8. the big one: 160^3 vascular demo (training ~50 min + two refine evals)
if [ "${1:-}" = "--with-vascular" ]; then
  step vascular_train 7200 python main.py -o /root/vascular_out \
      -d /root/vascular160_data -e vascular -s configs/vascular_demo || true
  VSET=$(ls -d /root/vascular_out/*/*/*/cur_task_setting.json 2>/dev/null | head -1)
  if [ -n "${VSET:-}" ]; then
    step vascular_refine_img 3600 python tools/refine_eval.py -s "$VSET" \
        --steps 30 --iso_spacing 2.2 || true
    step vascular_refine_proj 3600 python tools/refine_eval.py -s "$VSET" \
        --steps 30 --iso_spacing 2.2 --domain projection || true
  fi
else
  echo "=== vascular demo skipped (pass --with-vascular; ~50 min training)"
fi

echo "=== post-recovery runbook complete; logs in $LOGS"
