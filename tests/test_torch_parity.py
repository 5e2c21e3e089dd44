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


def port_weights(tmodel) -> dict:
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
    n = len(CHANNELS)
    for i in range(n):
        for j in range(LAYERS):
            p[f"down_{i}_res_{j}"] = _resnet(tmodel.down[i][j])
            if ATTN_DOWN[i]:
                p[f"down_{i}_attn_{j}"] = _attn(tmodel.attn_d[i][j])
        if i != n - 1:
            p[f"down_{i}_downsample"] = {"conv": _conv(tmodel.downsample[i])}
    # attn_up is diffusers up_block_types order: index 0 = deepest up block
    for i in range(n):
        for j in range(LAYERS + 1):
            p[f"up_{i}_res_{j}"] = _resnet(tmodel.up[i][j])
            if ATTN_UP[i]:
                p[f"up_{i}_attn_{j}"] = _attn(tmodel.attn_u[i][j])
        if i != n - 1:
            p[f"up_{i}_upsample"] = {"conv": _conv(tmodel.upsample[i][1])}
    return {"params": p}


def test_forward_parity():
    torch.manual_seed(0)
    tmodel = build_torch_unet(
        channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP, in_ch=3,
    ).eval()

    cfg = UNetConfig(
        sample_size=16, in_channels=3, out_channels=3,
        block_out_channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP,
    )
    jmodel = UNet2D(config=cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    t = np.array([17.0, 403.0], dtype=np.float32)

    # template init only pins the tree structure; weights come from torch
    template = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    ported = port_weights(tmodel)
    assert jax.tree.structure(template) == jax.tree.structure(
        jax.tree.map(jnp.asarray, ported)
    )
    chex_shapes_t = jax.tree.map(lambda a: a.shape, template)
    chex_shapes_p = jax.tree.map(lambda a: np.asarray(a).shape, ported)
    assert chex_shapes_t == chex_shapes_p

    with torch.no_grad():
        t_out = (
            tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    j_out = np.asarray(jmodel.apply(jax.tree.map(jnp.asarray, ported), x, t))

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)
