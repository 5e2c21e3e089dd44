"""Spatial partitioning: shard activations along H over the 'model' axis.

The reference never shards an image — its largest workload is 256² on one
GPU (models_Unet.py:157-159) and its only parallelism is batch DP
(SURVEY §2.3). On TPU the binding constraint at higher resolutions is HBM:
sampling activations grow O(H·W) per image while per-chip memory is fixed,
and DP cannot help once a SINGLE image's UNet activations outgrow one chip.
SURVEY §5 names spatial sharding of the UNet as the documented extension
path for that regime; this module makes it real.

Design — GSPMD, no hand-written halos:
  * NHWC activations carry NamedSharding(P('data', 'model')): batch over the
    data axis (plain DP) and image HEIGHT over the model axis. Params, EMA,
    and optimizer state stay replicated (this is the opposite trade from
    parallel/tp.py, which shards params and replicates activations — the two
    uses of the model axis are mutually exclusive, selected by
    --mesh_spatial).
  * Convolutions over a spatially sharded operand are partitioned by XLA
    with automatic halo exchanges over ICI (one (kernel−1)/2-row edge per
    neighbor); GroupNorm's spatial reductions and the attention einsums
    become cross-shard collectives the same way. No model code changes.
  * A with_sharding_constraint at the UNet input each step (train/step.py,
    sample/loop.py `activation_sharding`) pins the layout so XLA's sharding
    propagation cannot silently decide to all-gather H and run replicated.

Numerics are unchanged — tests/test_distributed.py::TestSpatialPartition
checks the SP train step and sampling scan against the single-device run on
the virtual 8-device CPU mesh, and __graft_entry__.dryrun_multichip runs an
SP phase so the driver validates the partitioning compiles and executes.

When to use: sampling or training at resolutions where one image's
activations approach per-chip HBM (512²+, or 256² with deep trajectories /
remat off). At flagship 64² the halo+collective traffic only adds latency —
keep it off (the same verdict pattern as TP at 113.7M params).
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from masked_diffusion_tpu.parallel.mesh import MeshPlan


def activation_sharding(plan: MeshPlan) -> NamedSharding:
    """NHWC activation sharding: batch over 'data', H over 'model'
    (W and C replicated — C is tiny and W keeps conv rows contiguous)."""
    return NamedSharding(plan.mesh, P("data", "model"))


def validate_spatial(plan: MeshPlan, height: int) -> None:
    """Fail fast on topologies spatial sharding cannot serve.

    H must divide evenly over the model axis, and the axis must be real
    (size > 1) — otherwise --mesh_spatial silently degenerates to DP, the
    kind of no-op flag this codebase rejects at build time
    (config.validate_sampling_modes precedent).
    """
    m = plan.model_size
    if m <= 1:
        raise ValueError(
            "--mesh_spatial shards image height over the 'model' mesh axis, "
            f"but the mesh has model={m}; set --mesh_model > 1 (e.g. "
            "--mesh_data 4 --mesh_model 2 on 8 chips)"
        )
    if height % m != 0:
        raise ValueError(
            f"--mesh_spatial needs image height {height} divisible by the "
            f"model axis ({m}); pick a mesh whose model size divides H"
        )
