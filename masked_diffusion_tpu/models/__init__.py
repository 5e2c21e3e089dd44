from masked_diffusion_tpu.models.unet import UNet2D, UNetConfig  # noqa: F401
from masked_diffusion_tpu.models.factory import build_unet, attention_placement  # noqa: F401
from masked_diffusion_tpu.models.ema import ema_decay, ema_update  # noqa: F401
from masked_diffusion_tpu.models.zoo import Model, ZOO_NAMES  # noqa: F401
