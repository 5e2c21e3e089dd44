"""Multi-host write discipline.

The reference gates every artifact/checkpoint write behind
`accelerator.is_main_process` (trainer_masked_mean_shift.py:242,
main_train_masked.py:313-319). The TPU-native policy, applied everywhere a
file is written:

  * ALL processes participate in orbax array saves — orbax coordinates the
    per-shard writes itself and expects the call to be collective
    (io/checkpoint.py calls it unconditionally);
  * ONLY process 0 writes everything else: run-directory trees, option.ini,
    metrics JSONL / wandb, PNG grids, meta.json / history.npz;
  * the run timestamp is derived on process 0 and broadcast
    (synced_timestamp), so all hosts agree on the result-tree path instead
    of each stamping its own wall clock.

A shared filesystem across hosts is assumed for resume (the same assumption
the reference's accelerate save/load_state makes).
"""

from __future__ import annotations

import datetime
from typing import Tuple


def process_index() -> int:
    import jax

    try:
        return jax.process_index()
    except Exception:  # backend not initialized yet: single-process
        return 0


def process_count() -> int:
    import jax

    try:
        return jax.process_count()
    except Exception:
        return 1


def is_main_process() -> bool:
    return process_index() == 0


def any_flag(local: bool) -> bool:
    """OR a host-side flag across processes (collective when multi-process).

    Used for the preemption flag: SIGTERM delivery is per-process and not
    simultaneous, so acting on the local flag alone would desynchronize the
    collective step/checkpoint sequence; all hosts must agree first."""
    if process_count() <= 1:
        return bool(local)
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(local)))
    return bool(np.any(flags))


def fetch(x):
    """Bring a (possibly batch-sharded, possibly non-addressable) global array
    fully to the host as numpy.

    Single-process: plain np.asarray. Multi-process: the array's shards live
    on other hosts too, so np.asarray would raise on non-addressable data —
    allgather it first. COLLECTIVE when multi-process: every process must
    call it (call before any is_main_process gate, never inside one)."""
    import numpy as np

    if process_count() <= 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def synced_timestamp() -> Tuple[str, str]:
    """(date, time) strings agreed across hosts: process 0's wall clock,
    broadcast over the mesh when more than one process is live."""
    now = datetime.datetime.now()
    if process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        stamp = np.asarray(int(now.timestamp()), dtype=np.int64)
        stamp = int(multihost_utils.broadcast_one_to_all(stamp))
        now = datetime.datetime.fromtimestamp(stamp)
    return now.strftime("%Y_%m_%d"), now.strftime("%H_%M_%S")
