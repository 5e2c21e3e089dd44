from masked_diffusion_tpu.ops.pallas.kmask import exact_count_masks_pallas  # noqa: F401
