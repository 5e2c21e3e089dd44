"""Import a reference-trained torch checkpoint into the orbax layout.

The reference serializes checkpoints through custom accelerate hooks
(main_train_masked.py:195-225): `checkpoint-epoch-N/unet/` is a diffusers
`UNet2DModel.save_pretrained` folder (config.json + a state dict in
diffusion_pytorch_model.safetensors or .bin) and `checkpoint-epoch-N/
unet_ema/` the same for `EMAModel.save_pretrained` (shadow weights, with the
EMA hyperparameters merged into config.json). This tool lets a reference user
bring those trained weights across:

    python -m masked_diffusion_tpu.io.import_torch <checkpoint-dir> <out-dir>

reads the diffusers folders WITHOUT diffusers (torch + safetensors only),
maps every parameter into the UNet2D flax tree, and writes an orbax
checkpoint (io/checkpoint.py layout) that --resume_from_checkpoint / --method
sample|test consume. The UNet topology is derived from unet/config.json
(down_block_types/up_block_types -> attn placement) and recorded in
meta.json['unet_config'] so the CLI flags can be checked against it.

The reference's optimizer.bin (torch Adam state) is NOT imported — torch Adam
moments have no 1:1 optax counterpart once the parameter tree is re-laid-out;
a resumed run restarts the optimizer (EMA + params are exact). meta.json
records `optimizer_imported: false`.

Weight-layout transforms (the same ones tests/test_torch_parity.py proved
forward-exact against the torch twin):
  conv   (O, I, kh, kw) -> HWIO kernel
  linear (out, in)      -> (in, out) kernel
  norm   weight/bias    -> scale/bias
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# old (pre-0.15) diffusers AttentionBlock naming -> the to_* naming our
# mapping speaks; reference-era checkpoints may carry either
_LEGACY_ATTN = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out",
}


def load_diffusers_folder(folder: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read one save_pretrained folder -> (flat numpy state dict, config).

    Prefers diffusion_pytorch_model.safetensors; falls back to the torch
    pickle .bin. Tensor names are normalized: legacy attention names
    (query/key/value/proj_attn) become to_q/to_k/to_v/to_out, and the
    `to_out.0` Sequential index diffusers emits is dropped.
    """
    cfg_path = os.path.join(folder, "config.json")
    config: dict = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)

    st_path = os.path.join(folder, "diffusion_pytorch_model.safetensors")
    bin_path = os.path.join(folder, "diffusion_pytorch_model.bin")
    raw: Dict[str, np.ndarray] = {}
    if os.path.exists(st_path):
        from safetensors import safe_open

        with safe_open(st_path, framework="numpy") as f:
            for k in f.keys():
                raw[k] = np.asarray(f.get_tensor(k))
    elif os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        raw = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    else:
        raise FileNotFoundError(
            f"no diffusion_pytorch_model.(safetensors|bin) under {folder}"
        )

    out: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        parts = k.split(".")
        parts = [_LEGACY_ATTN.get(p, p) for p in parts]
        # to_out is nn.Sequential(Linear, Dropout) in diffusers: drop the idx
        parts = [
            p for i, p in enumerate(parts)
            if not (p == "0" and i > 0 and parts[i - 1] == "to_out")
        ]
        out[".".join(parts)] = v
    return out, config


def unet_config_from_diffusers(config: dict):
    """Derive a models.unet.UNetConfig from a UNet2DModel config.json.

    Attention placement comes from the block-type lists (utils/model.py:6-20
    builds them; 'Attn*' = attention at that level). up_block_types is
    DEEPEST-first — the same order UNetConfig.attn_up uses."""
    from masked_diffusion_tpu.models.unet import UNetConfig

    down_types = config.get("down_block_types") or []
    up_types = config.get("up_block_types") or []
    channels = tuple(config.get("block_out_channels", (128, 128, 256, 256, 512, 512)))
    n = len(channels)
    attn_down = tuple(
        t.startswith("Attn") for t in down_types
    ) if down_types else (False,) * n
    attn_up = tuple(
        t.startswith("Attn") for t in up_types
    ) if up_types else (False,) * n
    head_dim = config.get("attention_head_dim", 8)
    if isinstance(head_dim, (list, tuple)):
        head_dim = head_dim[0]
    return UNetConfig(
        sample_size=config.get("sample_size", 64) or 64,
        in_channels=config.get("in_channels", 3),
        out_channels=config.get("out_channels", 3),
        block_out_channels=channels,
        layers_per_block=config.get("layers_per_block", 2),
        attn_down=attn_down,
        attn_up=attn_up,
        attention_head_dim=head_dim,
        norm_groups=config.get("norm_num_groups", 32),
        norm_eps=config.get("norm_eps", 1e-5),
        flip_sin_to_cos=config.get("flip_sin_to_cos", True),
        freq_shift=config.get("freq_shift", 0.0),
    )


def _conv(sd, name):
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{name}.bias"],
    }


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, pre):
    p = {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "conv1": _conv(sd, f"{pre}.conv1"),
        "time_emb_proj": _dense(sd, f"{pre}.time_emb_proj"),
        "norm2": _norm(sd, f"{pre}.norm2"),
        "conv2": _conv(sd, f"{pre}.conv2"),
    }
    if f"{pre}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut")
    return p


def _attn(sd, pre):
    return {
        "group_norm": _norm(sd, f"{pre}.group_norm"),
        "to_q": _dense(sd, f"{pre}.to_q"),
        "to_k": _dense(sd, f"{pre}.to_k"),
        "to_v": _dense(sd, f"{pre}.to_v"),
        "to_out": _dense(sd, f"{pre}.to_out"),
    }


def map_state_dict(sd: Dict[str, np.ndarray], ucfg) -> dict:
    """diffusers UNet2DModel state dict -> the UNet2D flax variables tree.

    Key vocabulary per level (models/unet.py naming):
      down_blocks.{i}.resnets.{j}      -> down_{i}_res_{j}
      down_blocks.{i}.attentions.{j}   -> down_{i}_attn_{j}
      down_blocks.{i}.downsamplers.0   -> down_{i}_downsample.conv
      mid_block.resnets.{0,1}          -> mid_res_{1,2}
      mid_block.attentions.0           -> mid_attn
      up_blocks.{i}.{...}              -> up_{i}_{...} (deepest-first on
                                          both sides)
      time_embedding.linear_{1,2}      -> time_dense{1,2}
      conv_norm_out                    -> norm_out
    """
    n = len(ucfg.block_out_channels)
    layers = ucfg.layers_per_block
    p: Dict[str, Any] = {
        "time_dense1": _dense(sd, "time_embedding.linear_1"),
        "time_dense2": _dense(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.0"),
        "mid_attn": _attn(sd, "mid_block.attentions.0"),
        "mid_res_2": _resnet(sd, "mid_block.resnets.1"),
        "norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for i in range(n):
        for j in range(layers):
            p[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if ucfg.attn_down[i]:
                p[f"down_{i}_attn_{j}"] = _attn(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i != n - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    for i in range(n):
        for j in range(layers + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if ucfg.attn_up[i]:
                p[f"up_{i}_attn_{j}"] = _attn(sd, f"up_blocks.{i}.attentions.{j}")
        if i != n - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return {"params": p}


def import_checkpoint(
    src: str,
    out_dir: str,
    epoch: Optional[int] = None,
    global_step: Optional[int] = None,
) -> str:
    """Convert one reference checkpoint dir (containing unet/ and optionally
    unet_ema/) into an orbax checkpoint under out_dir.

    `src` may also point directly at a save_pretrained folder (a dir with
    config.json), in which case it is treated as the unet and no EMA is
    imported. Returns the written checkpoint path."""
    src = os.path.abspath(src)
    unet_dir = src
    ema_dir = None
    if os.path.isdir(os.path.join(src, "unet")):
        unet_dir = os.path.join(src, "unet")
        if os.path.isdir(os.path.join(src, "unet_ema")):
            ema_dir = os.path.join(src, "unet_ema")

    sd, config = load_diffusers_folder(unet_dir)
    ucfg = unet_config_from_diffusers(config)
    params = map_state_dict(sd, ucfg)

    ema_params = None
    ema_meta: dict = {}
    if ema_dir is not None:
        ema_sd, ema_cfg = load_diffusers_folder(ema_dir)
        ema_params = map_state_dict(ema_sd, ucfg)
        # EMAModel.save_pretrained merges its hyperparameters into config.json
        ema_meta = {
            k: ema_cfg[k]
            for k in ("decay", "min_decay", "optimization_step", "power",
                      "inv_gamma", "update_after_step", "use_ema_warmup")
            if k in ema_cfg
        }

    if epoch is None:
        m = re.search(r"checkpoint-(?:epoch-)?(\d+)$", os.path.basename(src))
        epoch = int(m.group(1)) if m else 0
    if global_step is None:
        # the reference parses the suffix as the step on resume
        # (main_train_masked.py:271-275); EMA's optimization_step is the
        # per-update count and is the better signal when present
        global_step = int(ema_meta.get("optimization_step", epoch))

    from dataclasses import asdict

    from masked_diffusion_tpu.io.checkpoint import save_checkpoint

    extra_meta = {
        "imported_from": src,
        "optimizer_imported": False,
        "unet_config": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in asdict(ucfg).items()
            if k in (
                "sample_size", "in_channels", "out_channels",
                "block_out_channels", "layers_per_block", "attn_down",
                "attn_up", "attention_head_dim", "norm_groups",
            )
        },
    }
    if ema_meta:
        extra_meta["ema"] = ema_meta
    return save_checkpoint(
        out_dir, epoch, global_step, params, ema_params=ema_params,
        extra_meta=extra_meta,
    )


def main(argv=None) -> int:
    import argparse

    from masked_diffusion_tpu.utils.platform import force_platform

    # conversion is host-side numpy work: never init (or wedge on) the TPU
    force_platform("cpu")
    ap = argparse.ArgumentParser(
        prog="python -m masked_diffusion_tpu.io.import_torch",
        description="Import a reference torch checkpoint "
        "(checkpoint-*/unet[,unet_ema] diffusers folders) into the orbax "
        "layout this framework resumes/serves from.",
    )
    ap.add_argument("src", help="reference checkpoint dir (or a bare "
                    "save_pretrained folder)")
    ap.add_argument("out_dir", help="directory to write checkpoint-epoch-N into")
    ap.add_argument("--epoch", type=int, default=None,
                    help="override the epoch parsed from the src dir name")
    ap.add_argument("--global_step", type=int, default=None,
                    help="override the step (default: EMA optimization_step)")
    args = ap.parse_args(argv)
    path = import_checkpoint(args.src, args.out_dir, args.epoch, args.global_step)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    print(f"imported -> {path}")
    print(f"  items: {meta['items']}  epoch: {meta['epoch']}  "
          f"global_step: {meta['global_step']}")
    print(f"  unet_config: {json.dumps(meta['unet_config'])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
