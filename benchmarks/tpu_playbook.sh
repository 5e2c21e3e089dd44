#!/usr/bin/env bash
# Round-4 TPU measurement playbook. The tunnel drops for hours at a time;
# when it returns, fire this ONCE — it probes first, then runs every pending
# measurement serialized (one TPU job at a time, CLAUDE.md), saving raw JSON
# to docs/results_r4/. Each section is individually time-boxed so one wedged
# compile cannot eat the window.
#
#   bash benchmarks/tpu_playbook.sh            # everything
#   bash benchmarks/tpu_playbook.sh gn attn    # just those sections
#
# Sections:
#   trace  - benchmarks/trace_train.py: per-op attribution of the train
#            step's roofline gap (VERDICT r03 #8)
#   gn     - CHECK=gn check_fused_tpu.py: multi-image GroupNorm retry verdict
#   attn   - CHECK=attn check_fused_tpu.py: tinyhead kernel vs einsum/flash/
#            chunk at S=256/1024/4096 (+ the pending chunk-vs-flash verdict)
#   reuse  - CHECK=reuse check_fused_tpu.py: encoder-reuse throughput/drift
#   feed   - CHECK=feed check_fused_tpu.py: host-fed vs device-resident
#            batch feeding through the Trainer epoch loop
#   bench  - bench.py end-to-end sanity (the driver's round record path)

set -u
cd "$(dirname "$0")/.."
OUT=docs/results_r4
mkdir -p "$OUT"

probe() {
  timeout -k 10 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
    >/dev/null 2>&1
}

echo "probing TPU..."
if ! probe; then
  echo "TPU unreachable — aborting (re-run when the tunnel is back)"
  exit 1
fi
sleep 5  # HBM-release lag after the probe (CLAUDE.md)

OK=0
run() {  # run <name> <budget_s> <cmd...>
  local name=$1 budget=$2; shift 2
  echo "=== $name (budget ${budget}s) ==="
  timeout -k 15 "$budget" "$@" 2>"$OUT/$name.err" | tee "$OUT/$name.json"
  local rc=${PIPESTATUS[0]}
  [ "$rc" -eq 0 ] && OK=1
  echo "--- $name rc=$rc"
  sleep 8  # let HBM fully release before the next TPU job
}

ARGS=("$@")
for SEC in trace gn attn reuse feed bench; do
  case " ${ARGS[*]:-} " in
    "  ") ;;                           # no filter: run all
    *" $SEC "*) ;;                     # requested
    *) continue ;;
  esac
  case $SEC in
    trace) run trace 900 python benchmarks/trace_train.py ;;
    gn)    run gn 900 env CHECK=gn python benchmarks/check_fused_tpu.py ;;
    attn)  run attn 1800 env CHECK=attn python benchmarks/check_fused_tpu.py ;;
    reuse) run reuse 900 env CHECK=reuse python benchmarks/check_fused_tpu.py ;;
    feed)  run feed 900 env CHECK=feed python benchmarks/check_fused_tpu.py ;;
    bench) run bench 700 python bench.py ;;
  esac
done
echo "done — results in $OUT/ (any section ok: $OK)"
# nonzero when NO section succeeded, so tpu_watch.sh re-arms instead of
# disarming on a run the tunnel killed entirely
[ "$OK" -eq 1 ]
