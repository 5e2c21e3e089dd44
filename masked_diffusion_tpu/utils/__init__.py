from masked_diffusion_tpu.utils.dirs import Dir  # noqa: F401
from masked_diffusion_tpu.utils.grids import (  # noqa: F401
    make_grid,
    normalize01,
    normalize01_global,
    save_image_grid,
)
