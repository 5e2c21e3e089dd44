"""Tensor parallelism: channel sharding of wide layers over the 'model' axis.

The reference's only strategy is data parallelism (SURVEY §2.3 — accelerate
DDP, main_train_masked.py:184-227); the ('data','model') mesh here reserves a
model axis, and this module makes it real. Parameters whose output-feature
axis is wide enough and divisible by the model-axis size are sharded over it,
Megatron-style (conv HWIO kernels and dense (I,O) kernels on the last axis,
their (O,) biases alongside); everything narrow stays replicated. Optimizer
moments and EMA leaves follow the same by-shape rule, so the whole TrainState
is placed consistently.

There are no hand-written collectives: GSPMD propagates the shardings through
the jitted train step and the sampling scan, inserting the all-gathers /
reduce-scatters over ICI. Numerically this matches the replicated run to
float tolerance (tests/test_distributed.py::TestTensorParallel), which is the
TPU-native equivalent of a Megatron layer's identity — same math, partitioned
storage and compute.

Use for memory-bound configs (large-resolution zoo models, remat-off
training) where params + adamw moments + EMA dominate HBM: TP divides those
by the model-axis size without touching the model code.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from masked_diffusion_tpu.parallel.mesh import MeshPlan


def leaf_sharding(plan: MeshPlan, shape, min_features: int = 256) -> NamedSharding:
    """Sharding for one array by shape: last (output-feature) axis over
    'model' when it is wide and divisible; replicated otherwise."""
    m = plan.model_size
    if m > 1 and len(shape) >= 1 and shape[-1] >= min_features and shape[-1] % m == 0:
        return NamedSharding(plan.mesh, P(*([None] * (len(shape) - 1)), "model"))
    return plan.replicated


def tp_shardings(plan: MeshPlan, tree: Any, min_features: int = 256) -> Any:
    """Per-leaf shardings for an arbitrary pytree (params, a TrainState,
    optimizer moments) by the by-shape rule above."""
    return jax.tree.map(lambda x: leaf_sharding(plan, x.shape, min_features), tree)


def shard_tree(plan: MeshPlan, tree: Any, min_features: int = 256) -> Any:
    """Place a pytree onto the mesh with TP shardings (model axis > 1) —
    scalars and narrow arrays replicate, wide kernels shard."""
    return jax.device_put(tree, tp_shardings(plan, tree, min_features))


def sharded_fraction(plan: MeshPlan, tree: Any, min_features: int = 256) -> float:
    """Diagnostic: fraction of the tree's bytes stored sharded (not
    replicated) — what TP actually buys in per-chip memory."""
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(tree):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        s = leaf_sharding(plan, leaf.shape, min_features)
        if s.spec != P():
            sharded += nbytes
    return sharded / total if total else 0.0
