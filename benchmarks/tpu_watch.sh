#!/usr/bin/env bash
# Tunnel watcher: probe the TPU every 4 min; when it answers AND the CPU is
# clear (/tmp/cpu_clear exists — pytest done), fire the round-4 playbook once.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout -k 10 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; then
    date +%s > /tmp/tpu_up
    if [ -f /tmp/cpu_clear ] && [ ! -f /tmp/playbook_done ]; then
      echo "TPU up + CPU clear: firing playbook $(date)"
      sleep 8
      # disarm only on success: if the tunnel dropped again before the
      # playbook's own probe, rc!=0 — keep watching and retry next cycle
      bash benchmarks/tpu_playbook.sh 2>&1 | tee /tmp/playbook.log
      if [ "${PIPESTATUS[0]}" -eq 0 ]; then
        touch /tmp/playbook_done
        exit 0
      fi
      echo "playbook failed (tunnel dropped again?) — re-arming $(date)"
    fi
    echo "TPU up $(date) (cpu_clear=$([ -f /tmp/cpu_clear ] && echo yes || echo no))"
  else
    rm -f /tmp/tpu_up
    echo "TPU down $(date)"
  fi
  sleep 240
done
