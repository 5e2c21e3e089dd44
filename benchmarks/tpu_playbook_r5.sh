#!/usr/bin/env bash
# Round-5 TPU measurement queue. Fire ONCE after the convergence run frees
# the chip — probes first, then runs every section serialized (one TPU job
# at a time, CLAUDE.md), raw JSON to docs/results_r5/. Each section is
# individually time-boxed.
#
#   bash benchmarks/tpu_playbook_r5.sh             # everything
#   bash benchmarks/tpu_playbook_r5.sh trace scan  # just those
#
# Sections:
#   trace  - benchmarks/trace_train.py re-run with the FIXED module-event
#            attribution (VERDICT r4 #5: the committed r4 artifact still
#            shows the broken 2.9%-of-roofline reading)
#   attn4k - CHECK=attn4k: S=4096 escape-hatch ranking; per-arm timeouts
#            are now verdicts instead of section-killers (VERDICT r4 #3)
#   scan   - CHECK=scan: per-step loop vs whole-epoch lax.scan through the
#            real Trainer (train/step.py:make_train_epoch, new in r5)
#   reuse  - benchmarks/reuse_fidelity.py off the r5 convergence checkpoint
#            (set RF_CKPT before calling, or the section is skipped)

set -u
cd "$(dirname "$0")/.."
OUT=docs/results_r5
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
for SEC in trace attn4k scan reuse; do
  case " ${ARGS[*]:-} " in
    "  ") ;;
    *" $SEC "*) ;;
    *) continue ;;
  esac
  case $SEC in
    trace) run trace 2400 python benchmarks/trace_train.py ;;
    attn4k) run attn4k 2400 env CHECK=attn4k python benchmarks/check_fused_tpu.py ;;
    scan)  run scan 1800 env CHECK=scan python benchmarks/check_fused_tpu.py ;;
    reuse)
      if [ -n "${RF_CKPT:-}" ] && [ -d "${RF_CKPT:-}" ]; then
        run reuse_fidelity 1800 python benchmarks/reuse_fidelity.py
      else
        echo "reuse: RF_CKPT not set/found — skipped"
      fi ;;
  esac
done
echo "done — results in $OUT/ (any section ok: $OK)"
[ "$OK" -eq 1 ]
