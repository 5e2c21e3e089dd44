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
# Sections (round-4b queue — gn/attn landed in the first r4 run:
# gn LOSES again, tinyhead WINS 2.4-2.5x, docs/PERFORMANCE.md):
#   trace  - benchmarks/trace_train.py: per-op attribution (VERDICT r03 #8).
#            RE-RUN: the first cut triple-counted xplane lines
#   attn4k - CHECK=attn4k: S=4096 escape-hatch ranking, one arm per process
#            (a RESOURCE_EXHAUSTED poisons the shared client — all four
#            arms failed together in the first run)
#   attn_inloop - CHECK=attn_inloop: tinyhead auto-on end-to-end at 128²
#            unet6 (the standalone 2.4-2.5x win, measured in the real scan)
#   reuse  - CHECK=reuse: encoder-reuse throughput/drift. RE-RUN: the first
#            cut's uniform +0.02 param perturbation made the forward NaN
#   feed   - CHECK=feed: host-fed vs device-resident batch feeding. RE-RUN:
#            first run hit the 900s budget with output only at the end
#   bench  - bench.py end-to-end (the driver's round record path). RE-RUN:
#            the indexing+log section crashed on the fused kernel's cumsum
#            (no Mosaic lowering; fixed by the composite-key exact-k)

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
for SEC in trace attn4k attn_inloop reuse feed bench gn attn; do
  case " ${ARGS[*]:-} " in
    "  ") ;;                           # no filter: run all (gn/attn landed —
                                       # only by explicit request)
    *" $SEC "*) ;;                     # requested
    *) continue ;;
  esac
  case $SEC in
    gn|attn)
      # verdicts already recorded in docs/results_r4 — explicit only
      case " ${ARGS[*]:-} " in *" $SEC "*) ;; *) continue ;; esac ;;
  esac
  case $SEC in
    trace) run trace 900 python benchmarks/trace_train.py ;;
    gn)    run gn 900 env CHECK=gn python benchmarks/check_fused_tpu.py ;;
    attn)  run attn 1800 env CHECK=attn python benchmarks/check_fused_tpu.py ;;
    attn4k) run attn4k 2700 env CHECK=attn4k python benchmarks/check_fused_tpu.py ;;
    attn_inloop) run attn_inloop 1200 env CHECK=attn_inloop python benchmarks/check_fused_tpu.py ;;
    reuse) run reuse 900 env CHECK=reuse python benchmarks/check_fused_tpu.py ;;
    feed)  run feed 1500 env CHECK=feed python benchmarks/check_fused_tpu.py ;;
    bench) run bench 700 python bench.py ;;
  esac
done
echo "done — results in $OUT/ (any section ok: $OK)"
# nonzero when NO section succeeded, so tpu_watch.sh re-arms instead of
# disarming on a run the tunnel killed entirely
[ "$OK" -eq 1 ]
