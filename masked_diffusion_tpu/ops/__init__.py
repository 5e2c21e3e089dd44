from masked_diffusion_tpu.ops.schedule import MaskSchedule, build_schedule  # noqa: F401
