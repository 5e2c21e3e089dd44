"""Device mesh and sharding plan.

The reference's only parallelism is data parallelism via torch DDP/NCCL under
HF Accelerate (SURVEY.md §2.3: Accelerator(...) main_train_masked.py:184-227,
gpuMulti_config.yaml num_processes=4). The TPU-native equivalent is GSPMD:

  * one Mesh over all chips with a 'data' axis (and a reserved 'model' axis
    for tensor-parallel extensions),
  * the batch carries NamedSharding(P('data')), params/EMA/optimizer state are
    replicated,
  * jit emits the gradient all-reduce over ICI automatically — there is no
    hand-written communication backend, no per-batch barrier
    (trainer_masked_mean_shift.py:183), and no process-group timeout to tune.

Multi-host: call init_distributed() (jax.distributed.initialize) before any
jax op; the same mesh code then spans hosts, with XLA routing collectives over
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh

    @property
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P("data"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> MeshPlan:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model < n:
        # an explicit smaller topology runs on a prefix of the devices
        # (sharing a host with other jobs, or testing small meshes) — but say
        # so loudly: a typo'd topology silently training on fewer chips is
        # how a pod run loses 7/8ths of its throughput
        print(
            f"WARNING: mesh {data}x{model} uses only {data * model} of "
            f"{n} visible devices ({n - data * model} idle)",
            flush=True,
        )
        devices = devices[: data * model]
        n = len(devices)
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    return MeshPlan(mesh=Mesh(dev_array, ("data", "model")))


def shard_batch(plan: MeshPlan, batch):
    """Place a host array onto the mesh, sharded along the batch axis."""
    return jax.device_put(batch, plan.batch_sharding)


def replicate(plan: MeshPlan, tree):
    """Replicate a pytree (params / EMA / optimizer state) across the mesh."""
    return jax.device_put(tree, plan.replicated)


def init_distributed(**kwargs) -> None:
    """Multi-host init (replaces torch.distributed process-group setup)."""
    jax.distributed.initialize(**kwargs)


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier, the analog of accelerator.wait_for_everyone()
    (trainer_masked.py:166). Only needed around host-side I/O: in-program
    synchronization is handled by XLA collectives."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def put_global_batch(plan: MeshPlan, global_batch: np.ndarray, sharding=None):
    """Form the globally batch-sharded device array from host data.

    Single-process: a plain device_put with the batch sharding (or the
    caller's `sharding`, e.g. spatial partitioning's P('data','model') —
    parallel/sp.py). Multi-host (after init_distributed): each process passes
    the SAME logical global batch; only this process's slice is touched — the
    reference's per-rank DataLoader sharding (accelerator.prepare,
    main_train_masked.py:299) becomes process-local slicing +
    jax.make_array_from_process_local_data.
    """
    if sharding is None:
        sharding = plan.batch_sharding
    if jax.process_count() == 1:
        return jax.device_put(global_batch, sharding)
    # every process passes the same full global batch; with global_shape ==
    # data.shape, make_array_from_process_local_data takes each process's
    # addressable slices from the SAME coordinates of the global array — no
    # assumptions about which rows the mesh's device order assigned to which
    # process (hand-rolled contiguous slicing would silently permute rows
    # under create_device_mesh's topology-driven reordering)
    return jax.make_array_from_process_local_data(
        sharding, global_batch, global_batch.shape
    )


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of `multiple` >= n — the batch round-up every
    mesh-sharded latent path shares (generate_images, Trainer._cadence_latent,
    Tester._sample_batch, interpolation)."""
    if multiple <= 1:
        return n
    return -(-n // multiple) * multiple


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad a host batch so its leading dim divides the data axis; returns
    (padded, real_count)."""
    b = batch.shape[0]
    rem = b % multiple
    if rem == 0:
        return batch, b
    pad = multiple - rem
    padding = np.repeat(batch[-1:], pad, axis=0)
    return np.concatenate([batch, padding], axis=0), b
