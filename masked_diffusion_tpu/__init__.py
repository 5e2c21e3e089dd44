"""masked_diffusion_tpu — a TPU-native (JAX/Flax/pjit/Pallas) masked-diffusion framework.

A from-scratch rebuild of the capabilities of hytae1993/masked-diffusion-model
(reference mounted at /root/reference): masked ("cold") diffusion where the
forward process progressively masks pixels and fills them with a mean value,
a time-conditioned U-Net predicts the reconstruction residual, and sampling
runs a cold-diffusion / momentum reverse loop — plus the mean-shift variant
that perturbs the degraded image before the network and inverts it after.

Design stance (not a port):
  * pure functions over explicit state; all randomness via jax.random keys
  * schedule tables precomputed host-side, consumed as device constants
  * train step and the full reverse-sampling pass are single jitted programs
    (the sampler is a lax.scan over the timestep table)
  * data parallelism via jax.sharding.Mesh + NamedSharding (GSPMD emits the
    gradient all-reduce over ICI); no hand-written communication backend
  * bf16 compute / fp32 params+loss on TPU

Layer map (mirrors SURVEY.md section 7):
  ops/       schedule tables, degrade ops, shift ops, pallas kernels
  models/    Flax U-Net family (diffusers-UNet2DModel design space), EMA
  train/     jitted train step, optax optimizers/LR schedules, orchestration
  sample/    lax.scan reverse-process sampler, latent initialization
  parallel/  device mesh, shardings, multi-host helpers
  data/      in-memory datasets, transforms, data-mean histogram
  io/        orbax checkpoints with the reference's checkpoint-epoch-N layout
  utils/     run-directory tree, option dump, image grids, visualizer
  cli/       main_train_masked-compatible argparse entry point
"""

__version__ = "0.1.0"

from masked_diffusion_tpu.config import Config  # noqa: F401
