"""Model zoo: every named config builds and runs forward with the right
shapes (capability surface of models/models_Unet.py:17-175, models_simple.py,
models_Saliency.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.models.zoo import Model, ZOO_NAMES, _attn_at_resolutions
from masked_diffusion_tpu.models.unet import count_params


@pytest.mark.parametrize("name", ZOO_NAMES)
def test_zoo_forward_shapes(name):
    size = 32
    model = Model(name, 3, size, size)
    x = jnp.zeros((2, size, size, 3))
    t = jnp.ones((2,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert count_params(params) > 0


def test_zoo_default_routes_to_factory():
    m = Model("default", 3, 32, 32, num_attention=1)
    assert len(m.config.block_out_channels) == 6


def test_unet6_per_resolution_tables():
    # 32/64: mults [1,2,2,2] + attn level 2; 128/256: [1,1,2,2,4,4] + level 4
    # (models_Unet.py:142-159)
    m32 = Model("unet6", 3, 32, 32)
    assert m32.config.block_out_channels == (128, 256, 256, 256)
    assert m32.config.attn_down == (False, False, True, False)
    m128 = Model("unet6", 3, 128, 128)
    assert m128.config.block_out_channels == (128, 128, 256, 256, 512, 512)
    assert m128.config.attn_down == (False, False, False, False, True, False)


def test_attention_resolution_conversion():
    # image 64, 4 levels -> resolutions 64,32,16,8; attend at {16,8}
    # (unet5's now_res semantics, unet5.py:43-48)
    assert _attn_at_resolutions(64, 4, (16, 8)) == (False, False, True, True)


@pytest.mark.parametrize("size", [32, 64, 128])
def test_unet4_attends_deepest_only(size):
    """models_Unet.py:72 passes (16,8) into unet4.py where `ds` is the
    DOWNSAMPLE RATE (unet4.py:860,875,910): only ds=8 (the deepest of 4
    levels) ever matches, at every image size — NOT feature resolutions."""
    m = Model("unet4", 3, size, size)
    assert m.config.attn_down == (False, False, False, True)
    assert m.config.attn_up == (True, False, False, False)


def test_unknown_name_raises():
    with pytest.raises(NotImplementedError):
        Model("unet7", 3, 32, 32)


def test_ebgan_models():
    from masked_diffusion_tpu.models.ebgan import AutoEncoder, EBDiscriminator, EBGenerator

    g = EBGenerator()
    z = jnp.zeros((2, 62))
    gp = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(gp, z)
    assert img.shape == (2, 32, 32, 1)
    assert float(jnp.abs(img).max()) <= 1.0  # tanh range

    d = EBDiscriminator()
    dp = d.init(jax.random.PRNGKey(1), img)
    recon, emb = d.apply(dp, img)
    assert recon.shape == img.shape
    assert emb.shape == (2, 32)

    ae = AutoEncoder()
    x = jnp.zeros((2, 28, 28, 1))
    ap = ae.init(jax.random.PRNGKey(2), x)
    assert ae.apply(ap, x).shape == x.shape


def test_saliency_models():
    from masked_diffusion_tpu.models.saliency import (
        Descriptor,
        SaliencyModel,
        holistic_attention,
    )

    gen = SaliencyModel("generator", "from_latent", width=8, latent_dim=4)
    x = jnp.zeros((2, 32, 32, 3))
    z = jnp.zeros((2, 4))
    gp = gen.init(jax.random.PRNGKey(0), x, z)
    sal = gen.apply(gp, x, z)
    assert sal.shape == (2, 32, 32, 1)

    base = SaliencyModel("generator", "from_image", width=8)
    bp = base.init(jax.random.PRNGKey(1), x)
    assert base.apply(bp, x).shape == (2, 32, 32, 1)

    des = Descriptor(width=8)
    dp = des.init(jax.random.PRNGKey(2), x, sal)
    energy = des.apply(dp, x, sal)
    assert energy.shape == (2,)

    # HA: blurred attention floors at the raw attention and gates features
    attn = jnp.zeros((1, 16, 16, 1)).at[:, 8, 8, :].set(1.0)
    feat = jnp.ones((1, 16, 16, 3))
    out = holistic_attention(attn, feat)
    assert out.shape == feat.shape
    assert float(out[0, 8, 8, 0]) == pytest.approx(1.0)  # max(soft, attn)=1 at peak
    assert float(out[0, 8, 9, 0]) > 0.0  # blur spreads mass


def test_saliency_bad_work_raises():
    from masked_diffusion_tpu.models.saliency import SaliencyModel

    with pytest.raises(NotImplementedError):
        SaliencyModel("critic")


def test_build_model_from_config_dispatch():
    """Trainer and the --method test arm share one dispatch — a zoo-trained
    checkpoint must meet the same parameter tree at evaluation."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.train.trainer import build_model_from_config

    cfg = Config(model="unet6", data_size=32, in_channel=3, out_channel=3)
    m = build_model_from_config(cfg)
    assert m.config.block_out_channels == (128, 256, 256, 256)

    cfg = Config(model="default", data_size=32, num_attention=1)
    m = build_model_from_config(cfg)
    assert len(m.config.block_out_channels) == 6


def test_build_model_from_config_plumbs_memory_knobs():
    """--remat / --attention_chunk reach the UNetConfig through BOTH dispatch
    arms (default factory and zoo), so the CLI's memory escape hatches apply
    to every trainable model."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.train.trainer import build_model_from_config

    for model in ("default", "unet6"):
        cfg = Config(model=model, data_size=32, in_channel=3, out_channel=3,
                     remat=True, attention_chunk=256)
        m = build_model_from_config(cfg)
        assert m.config.remat is True, model
        assert m.config.attention_chunk == 256, model
        # 0 normalizes to None (off), matching the einsum default path
        cfg = Config(model=model, data_size=32, in_channel=3, out_channel=3,
                     attention_chunk=0)
        m = build_model_from_config(cfg)
        assert m.config.attention_chunk is None, model
        assert m.config.remat is False, model
