from masked_diffusion_tpu.io.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    find_resume_checkpoint,
)
