"""Round-trip test for the torch-checkpoint import tool.

Builds the torch twin (benchmarks/torch_cpu_reference.py — the
forward-parity-proven stand-in for the diffusers UNet2DModel the reference
trains), serializes it EXACTLY the way the reference's accelerate hooks do
(main_train_masked.py:195-225: checkpoint-*/unet and unet_ema diffusers
save_pretrained folders, config.json + state dict with diffusers tensor
names), runs `io.import_torch`, restores the orbax checkpoint, and checks
the flax forward matches the torch forward — i.e. a reference user's trained
weights really do come across bit-meaningfully.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from benchmarks.torch_cpu_reference import build_torch_unet
from masked_diffusion_tpu.io.checkpoint import load_checkpoint
from masked_diffusion_tpu.io.import_torch import (
    import_checkpoint,
    load_diffusers_folder,
    map_state_dict,
    unet_config_from_diffusers,
)
from masked_diffusion_tpu.models.unet import UNet2D

CHANNELS = (64, 128)
LAYERS = 1
ATTN_DOWN = (False, True)
ATTN_UP = (True, False)
SIZE = 16


def _diffusers_config() -> dict:
    """The config.json UNet2DModel.save_pretrained writes for this topology
    (utils/model.py:24-32 field vocabulary)."""
    return {
        "_class_name": "UNet2DModel",
        "sample_size": SIZE,
        "in_channels": 3,
        "out_channels": 3,
        "layers_per_block": LAYERS,
        "block_out_channels": list(CHANNELS),
        "down_block_types": [
            "AttnDownBlock2D" if a else "DownBlock2D" for a in ATTN_DOWN
        ],
        "up_block_types": [
            "AttnUpBlock2D" if a else "UpBlock2D" for a in ATTN_UP
        ],
        "attention_head_dim": 8,
        "norm_num_groups": 32,
        "norm_eps": 1e-5,
        "flip_sin_to_cos": True,
        "freq_shift": 0,
    }


def _twin_to_diffusers_sd(tmodel, legacy_attn_names=False) -> dict:
    """Serialize the twin's modules under diffusers UNet2DModel tensor names."""
    sd = {}

    def conv(pre, m):
        sd[f"{pre}.weight"] = m.weight.detach().clone()
        sd[f"{pre}.bias"] = m.bias.detach().clone()

    def dense(pre, m):
        sd[f"{pre}.weight"] = m.weight.detach().clone()
        sd[f"{pre}.bias"] = m.bias.detach().clone()

    def norm(pre, m):
        sd[f"{pre}.weight"] = m.weight.detach().clone()
        sd[f"{pre}.bias"] = m.bias.detach().clone()

    def resnet(pre, m):
        norm(f"{pre}.norm1", m.n1)
        conv(f"{pre}.conv1", m.c1)
        dense(f"{pre}.time_emb_proj", m.t)
        norm(f"{pre}.norm2", m.n2)
        conv(f"{pre}.conv2", m.c2)
        if not isinstance(m.skip, torch.nn.Identity):
            conv(f"{pre}.conv_shortcut", m.skip)

    def attn(pre, m):
        q, k, v = ("query", "key", "value") if legacy_attn_names else (
            "to_q", "to_k", "to_v")
        out = f"{pre}.proj_attn" if legacy_attn_names else f"{pre}.to_out.0"
        c = m.qkv.weight.shape[1]
        w, b = m.qkv.weight.detach(), m.qkv.bias.detach()
        for i, name in enumerate((q, k, v)):
            sd[f"{pre}.{name}.weight"] = w[i * c:(i + 1) * c].clone()
            sd[f"{pre}.{name}.bias"] = b[i * c:(i + 1) * c].clone()
        dense(out, m.out)
        norm(f"{pre}.group_norm", m.norm)

    dense("time_embedding.linear_1", tmodel.temb[0])
    dense("time_embedding.linear_2", tmodel.temb[2])
    conv("conv_in", tmodel.conv_in)
    n = len(CHANNELS)
    for i in range(n):
        for j in range(LAYERS):
            resnet(f"down_blocks.{i}.resnets.{j}", tmodel.down[i][j])
            if ATTN_DOWN[i]:
                attn(f"down_blocks.{i}.attentions.{j}", tmodel.attn_d[i][j])
        if i != n - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", tmodel.downsample[i])
    resnet("mid_block.resnets.0", tmodel.mid1)
    attn("mid_block.attentions.0", tmodel.mid_attn)
    resnet("mid_block.resnets.1", tmodel.mid2)
    for i in range(n):
        for j in range(LAYERS + 1):
            resnet(f"up_blocks.{i}.resnets.{j}", tmodel.up[i][j])
            if ATTN_UP[i]:
                attn(f"up_blocks.{i}.attentions.{j}", tmodel.attn_u[i][j])
        if i != n - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", tmodel.upsample[i][1])
    norm("conv_norm_out", tmodel.norm_out)
    conv("conv_out", tmodel.conv_out)
    return sd


def _write_pretrained(folder, sd, config, fmt="safetensors"):
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "config.json"), "w") as f:
        json.dump(config, f)
    if fmt == "safetensors":
        from safetensors.torch import save_file

        save_file(
            {k: v.contiguous() for k, v in sd.items()},
            os.path.join(folder, "diffusion_pytorch_model.safetensors"),
        )
    else:
        torch.save(sd, os.path.join(folder, "diffusion_pytorch_model.bin"))


def _twin(seed):
    torch.manual_seed(seed)
    return build_torch_unet(
        channels=CHANNELS, layers_per_block=LAYERS,
        attn_down=ATTN_DOWN, attn_up=ATTN_UP, in_ch=3,
    ).eval()


def _torch_forward(tmodel, x, t):
    with torch.no_grad():
        return (
            tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
            .numpy().transpose(0, 2, 3, 1)
        )


@pytest.fixture
def probe():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32)
    t = np.array([17.0, 403.0], dtype=np.float32)
    return x, t


class TestImportRoundTrip:
    @pytest.mark.parametrize("fmt", ["safetensors", "bin"])
    def test_unet_plus_ema_roundtrip(self, tmp_path, probe, fmt):
        x, t = probe
        tmodel, temodel = _twin(0), _twin(1)  # distinct "train" and "EMA"
        src = tmp_path / "checkpoint-epoch-7"
        _write_pretrained(src / "unet", _twin_to_diffusers_sd(tmodel),
                          _diffusers_config(), fmt)
        ema_cfg = {**_diffusers_config(), "decay": 0.9999,
                   "optimization_step": 1234, "power": 0.75}
        _write_pretrained(src / "unet_ema", _twin_to_diffusers_sd(temodel),
                          ema_cfg, fmt)

        out = import_checkpoint(str(src), str(tmp_path / "out"))
        assert out.endswith("checkpoint-epoch-7")

        # restore through the normal resume path
        _, config = load_diffusers_folder(str(src / "unet"))
        ucfg = unet_config_from_diffusers(config)
        jmodel = UNet2D(config=ucfg)
        template = jmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t)
        )
        params, ema, _, meta = load_checkpoint(out, template, template)
        assert meta["global_step"] == 1234  # EMA optimization_step wins
        assert meta["optimizer_imported"] is False
        assert meta["ema"]["decay"] == 0.9999
        assert meta["unet_config"]["block_out_channels"] == list(CHANNELS)

        np.testing.assert_allclose(
            np.asarray(jmodel.apply(params, x, t)),
            _torch_forward(tmodel, x, t), atol=2e-4, rtol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(jmodel.apply(ema, x, t)),
            _torch_forward(temodel, x, t), atol=2e-4, rtol=2e-3,
        )

    def test_legacy_attention_names(self, tmp_path, probe):
        """Pre-0.15 diffusers checkpoints name attention query/key/value/
        proj_attn; the loader normalizes them."""
        x, t = probe
        tmodel = _twin(2)
        folder = tmp_path / "unet_only"
        _write_pretrained(
            folder, _twin_to_diffusers_sd(tmodel, legacy_attn_names=True),
            _diffusers_config(),
        )
        sd, config = load_diffusers_folder(str(folder))
        assert any(k.endswith("to_q.weight") for k in sd)
        assert not any("query" in k for k in sd)
        ucfg = unet_config_from_diffusers(config)
        variables = jax.tree.map(jnp.asarray, map_state_dict(sd, ucfg))
        jmodel = UNet2D(config=ucfg)
        np.testing.assert_allclose(
            np.asarray(jmodel.apply(variables, x, t)),
            _torch_forward(tmodel, x, t), atol=2e-4, rtol=2e-3,
        )

    def test_bare_pretrained_folder_no_ema(self, tmp_path):
        """`src` may be a save_pretrained folder directly (no unet/ nesting,
        no EMA) — e.g. a model exported outside the trainer."""
        tmodel = _twin(3)
        folder = tmp_path / "export"
        _write_pretrained(folder, _twin_to_diffusers_sd(tmodel),
                          _diffusers_config())
        out = import_checkpoint(str(folder), str(tmp_path / "out"), epoch=5)
        assert out.endswith("checkpoint-epoch-5")
        with open(os.path.join(out, "meta.json")) as f:
            meta = json.load(f)
        assert meta["items"] == ["unet"]  # no EMA imported

    def test_cli_entrypoint(self, tmp_path, capsys):
        from masked_diffusion_tpu.io.import_torch import main

        tmodel = _twin(4)
        src = tmp_path / "checkpoint-epoch-2"
        _write_pretrained(src / "unet", _twin_to_diffusers_sd(tmodel),
                          _diffusers_config())
        rc = main([str(src), str(tmp_path / "out")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "imported ->" in out and "checkpoint-epoch-2" in out
