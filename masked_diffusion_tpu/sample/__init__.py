from masked_diffusion_tpu.sample.loop import make_sample_fn  # noqa: F401
from masked_diffusion_tpu.sample.latent import latent_initial, latent_initial_interpolation  # noqa: F401
