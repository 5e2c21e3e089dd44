from masked_diffusion_tpu.data.datasets import InMemoryDataset, get_dataset  # noqa: F401
from masked_diffusion_tpu.data.histogram import compute_mean_histogram  # noqa: F401
