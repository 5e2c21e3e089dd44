"""Golden-value parity vs a PyTorch twin (SURVEY.md §4: cross-framework RNG
streams can't match, so parity is defined on deterministic inputs with
identical weights).

benchmarks/torch_cpu_reference.py builds a CPU-torch UNet with the same
topology as models/unet.UNet2D. This test ports its randomly-initialized
weights into the Flax parameter tree and checks the forward outputs agree to
float32 tolerance — validating conv/GroupNorm/attention/time-embedding
semantics (diffusers UNet2DModel contract, utils/model.py:24-32) rather than
just shapes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from benchmarks.torch_cpu_reference import build_torch_unet
from masked_diffusion_tpu.models.unet import UNet2D, UNetConfig

# channels must keep 32 GroupNorm groups on both sides (flax _norm_groups
# caps at channels//2, torch probe hardcodes 32)
CHANNELS = (64, 128)
LAYERS = 1
ATTN_DOWN = (False, True)
ATTN_UP = (True, False)


def _conv(m):
    return {
        "kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": m.bias.detach().numpy(),
    }


def _dense(m):
    return {
        "kernel": m.weight.detach().numpy().T,
        "bias": m.bias.detach().numpy(),
    }


def _norm(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def _resnet(m):
    p = {
        "norm1": _norm(m.n1),
        "conv1": _conv(m.c1),
        "time_emb_proj": _dense(m.t),
        "norm2": _norm(m.n2),
        "conv2": _conv(m.c2),
    }
    if not isinstance(m.skip, torch.nn.Identity):
        p["conv_shortcut"] = _conv(m.skip)
    return p


def _attn(m):
    qkv_w = m.qkv.weight.detach().numpy()  # (3c, c)
    qkv_b = m.qkv.bias.detach().numpy()
    c = qkv_w.shape[1]
    parts = {}
    for i, name in enumerate(("to_q", "to_k", "to_v")):
        parts[name] = {
            "kernel": qkv_w[i * c : (i + 1) * c].T,
            "bias": qkv_b[i * c : (i + 1) * c],
        }
    parts["group_norm"] = _norm(m.norm)
    parts["to_out"] = _dense(m.out)
    return parts


def port_weights(
    tmodel, channels=CHANNELS, layers=LAYERS,
    attn_down=ATTN_DOWN, attn_up=ATTN_UP,
) -> dict:
    p = {
        "time_dense1": _dense(tmodel.temb[0]),
        "time_dense2": _dense(tmodel.temb[2]),
        "conv_in": _conv(tmodel.conv_in),
        "mid_res_1": _resnet(tmodel.mid1),
        "mid_attn": _attn(tmodel.mid_attn),
        "mid_res_2": _resnet(tmodel.mid2),
        "norm_out": _norm(tmodel.norm_out),
        "conv_out": _conv(tmodel.conv_out),
    }
    n = len(channels)
    for i in range(n):
        for j in range(layers):
            p[f"down_{i}_res_{j}"] = _resnet(tmodel.down[i][j])
            if attn_down[i]:
                p[f"down_{i}_attn_{j}"] = _attn(tmodel.attn_d[i][j])
        if i != n - 1:
            p[f"down_{i}_downsample"] = {"conv": _conv(tmodel.downsample[i])}
    # attn_up is diffusers up_block_types order: index 0 = deepest up block
    for i in range(n):
        for j in range(layers + 1):
            p[f"up_{i}_res_{j}"] = _resnet(tmodel.up[i][j])
            if attn_up[i]:
                p[f"up_{i}_attn_{j}"] = _attn(tmodel.attn_u[i][j])
        if i != n - 1:
            p[f"up_{i}_upsample"] = {"conv": _conv(tmodel.upsample[i][1])}
    return {"params": p}


def run_forward_parity(
    channels, layers, attn_down, attn_up, in_ch=3, size=16,
    atol=2e-4, rtol=2e-3, seed=0, check_tree=False,
):
    """Build twin + flax UNet at one topology, port weights, compare the
    forward on a fixed probe batch. The strongest wiring check available:
    any disagreement on resnet/attention interleave, skip order, or
    up-block channel bookkeeping shifts every downstream activation."""
    torch.manual_seed(seed)
    tmodel = build_torch_unet(
        channels=channels, layers_per_block=layers,
        attn_down=attn_down, attn_up=attn_up, in_ch=in_ch,
    ).eval()
    cfg = UNetConfig(
        sample_size=size, in_channels=in_ch, out_channels=in_ch,
        block_out_channels=tuple(channels), layers_per_block=layers,
        attn_down=tuple(attn_down), attn_up=tuple(attn_up),
    )
    jmodel = UNet2D(config=cfg)

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, size, size, in_ch)).astype(np.float32)
    t = np.array([17.0, 403.0], dtype=np.float32)

    ported = port_weights(tmodel, channels, layers, attn_down, attn_up)
    if check_tree:
        template = jmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t)
        )
        assert jax.tree.structure(template) == jax.tree.structure(
            jax.tree.map(jnp.asarray, ported)
        )
        shapes_t = jax.tree.map(lambda a: a.shape, template)
        shapes_p = jax.tree.map(lambda a: np.asarray(a).shape, ported)
        assert shapes_t == shapes_p

    with torch.no_grad():
        t_out = (
            tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    j_out = np.asarray(jmodel.apply(jax.tree.map(jnp.asarray, ported), x, t))
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=atol, rtol=rtol)


def test_forward_parity():
    run_forward_parity(CHANNELS, LAYERS, ATTN_DOWN, ATTN_UP, check_tree=True)


@pytest.mark.parametrize("num_attention", [1, 2, 3, 4, 5])
def test_placement_grid_parity(num_attention):
    """Forward parity across the FULL --num_attention placement table
    (utils/model.py:6-20) at the real 6-level depth: a shared misreading of
    diffusers block wiring at any attention position (resnet/attention
    interleave, skip order at attentive up levels) would shift outputs here.
    Channels stay 64 so GroupNorm keeps 32 groups on both sides; 32² input
    exercises all 5 downsamples (deepest level at 1x1)."""
    from masked_diffusion_tpu.models.factory import attention_placement

    attn_down, attn_up = attention_placement(num_attention, 6)
    run_forward_parity(
        (64,) * 6, 1, attn_down, attn_up, size=32, seed=num_attention,
    )


def test_one_channel_parity():
    """MNIST-shaped 1-channel in/out (the reference trains 1-channel MNIST;
    scheduler.py's 3-channel hardcodes were the bug class to avoid)."""
    run_forward_parity(CHANNELS, LAYERS, ATTN_DOWN, ATTN_UP, in_ch=1, seed=7)


def test_zoo_unet6_32_parity():
    """The unet6 32² zoo table (models_Unet.py:142-150: base 128, mults
    [1,2,2,2], attention at level 2) against the twin at the SAME topology —
    parity beyond the factory family."""
    from masked_diffusion_tpu.models.zoo import _zoo_config

    cfg = _zoo_config("unet6", 3, 32, 3)
    assert cfg.block_out_channels == (128, 256, 256, 256)
    run_forward_parity(
        cfg.block_out_channels, cfg.layers_per_block,
        cfg.attn_down, cfg.attn_up, size=32, seed=11,
        atol=5e-4, rtol=2e-3,  # deeper/wider accumulation than the base case
    )
