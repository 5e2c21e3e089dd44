from masked_diffusion_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    make_mesh,
    shard_batch,
    replicate,
    sync_global_devices,
)
