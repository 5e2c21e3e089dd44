"""Shared shard_map harness for data-parallel Pallas kernels.

pallas_call has no GSPMD partitioning rule: under a plain jit with the batch
sharded over 'data', XLA would all-gather the batch to every chip and run the
kernel replicated, negating any measured win. Every multi-chip Pallas route
in this package therefore goes through ONE harness so the load-bearing
semantics are pinned in a single place:

  * one independent kernel per shard over its LOCAL batch rows;
  * each shard folds its axis index into the PRNG key — a shared seed would
    give image i on every shard the same mask (correlated sampling across
    the global batch). Streams are therefore NOT equal to the single-chip
    call (distribution-identical, deterministic per (key, mesh topology));
  * the global batch must divide the axis size (checked here, with one error
    message for every kernel);
  * mesh axes other than `axis` (e.g. 'model') are left unmentioned: inputs
    are replicated across them and every replica computes identical outputs
    (the kernels are deterministic given their seed).

Used by ops/pallas/fused_degrade.py:fused_degrade_update_sharded and
ops/pallas/kmask.py:exact_count_masks_pallas_sharded; their interpret-mode
equality tests (tests/test_pallas_sharded.py) pin this harness's plumbing
(slicing, key folding, reassembly) against manual per-shard calls.
"""

from __future__ import annotations

import jax


def data_parallel_kernel(fn, *, mesh, axis: str = "data"):
    """Wrap fn(key, *batch_major_args) to run one kernel per `axis` shard.

    Returns call(key, *args): every arg is sharded on dim 0 over `axis`
    (the key is replicated, then folded per shard); the output tree's leaves
    are likewise batch-major and reassembled along dim 0. Raises ValueError
    when dim 0 does not divide the axis size.
    """
    from jax.sharding import PartitionSpec as P

    def body(key, *args):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return fn(key, *args)

    def call(key, *sharded_args):
        n = mesh.shape[axis]
        b = sharded_args[0].shape[0]
        if b % n:
            raise ValueError(
                f"batch {b} not divisible by mesh axis {axis}={n}"
            )
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(),) + (P(axis),) * len(sharded_args),
            out_specs=P(axis),
            check_vma=False,
        )(key, *sharded_args)

    return call
