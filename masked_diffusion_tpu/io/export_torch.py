"""Export an orbax checkpoint to the reference's torch checkpoint layout.

The inverse of io/import_torch.py: reads a `checkpoint-epoch-N/` dir written
by this framework (io/checkpoint.py layout) and produces the diffusers-style
folders the reference's accelerate load hooks consume
(main_train_masked.py:195-225): `unet/` (config.json + a state dict under
diffusers UNet2DModel tensor names) and, when the checkpoint carries EMA
weights, `unet_ema/` (EMAModel.save_pretrained shape: shadow weights with the
EMA hyperparameters merged into config.json). Together with import_torch this
closes the interop loop — weights trained here can be served or fine-tuned by
the reference stack, and vice versa:

    python -m masked_diffusion_tpu.io.export_torch <checkpoint-dir> <out-dir>

No diffusers and no torch required: the state dict is written with
safetensors (numpy framework), which diffusers' from_pretrained prefers over
the .bin pickle anyway; `--format bin` additionally writes the torch pickle
when torch is importable.

The UNet topology is recovered from the checkpoint itself — meta.json's
`unet_config` when present (import_torch writes it), else derived from the
parameter tree (level count, layers per block, channels, and attention
placement are all visible in the tree's keys and conv shapes). Only
`sample_size`, `attention_head_dim`, and `norm_num_groups` are pure config
with no imprint on parameter shapes; they default to the reference's values
(utils/model.py:24-32) and have CLI overrides.

Weight-layout transforms (exact inverses of import_torch.map_state_dict, the
mapping tests/test_torch_parity.py proved forward-exact):
  HWIO conv kernel      -> (O, I, kh, kw) weight
  (in, out) dense kernel -> (out, in) weight
  norm scale/bias        -> weight/bias
Attention projections are emitted under the modern diffusers names
(to_q/to_k/to_v/to_out.0 — the Sequential index diffusers expects).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _leaf(tree: dict, *path: str) -> np.ndarray:
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def unet_config_from_params(
    params: Dict[str, Any],
    sample_size: int = 64,
    attention_head_dim: int = 8,
    norm_groups: int = 32,
):
    """Reconstruct the UNetConfig from a parameter tree's structure.

    Everything shape-bearing is derived: levels = #down_{i}_res_0 keys,
    layers_per_block = #down_0_res_{j} keys, block_out_channels from each
    level's conv1 HWIO output dim, in/out channels from conv_in/conv_out, and
    attention placement from the presence of down_{i}_attn_0 / up_{i}_attn_0.
    """
    from masked_diffusion_tpu.models.unet import UNetConfig

    n = sum(1 for k in params if k.startswith("down_") and k.endswith("_res_0"))
    layers = sum(
        1 for k in params
        if k.startswith("down_0_res_") and k.split("_")[-1].isdigit()
    )
    channels = tuple(
        int(_leaf(params, f"down_{i}_res_0", "conv1", "kernel").shape[3])
        for i in range(n)
    )
    return UNetConfig(
        sample_size=sample_size,
        in_channels=int(_leaf(params, "conv_in", "kernel").shape[2]),
        out_channels=int(_leaf(params, "conv_out", "kernel").shape[3]),
        block_out_channels=channels,
        layers_per_block=layers,
        attn_down=tuple(f"down_{i}_attn_0" in params for i in range(n)),
        attn_up=tuple(f"up_{i}_attn_0" in params for i in range(n)),
        attention_head_dim=attention_head_dim,
        norm_groups=norm_groups,
    )


def diffusers_config_from_unet(ucfg) -> dict:
    """The config.json UNet2DModel.save_pretrained writes for this topology
    (field vocabulary of the reference's factory, utils/model.py:24-32)."""
    return {
        "_class_name": "UNet2DModel",
        "sample_size": ucfg.sample_size,
        "in_channels": ucfg.in_channels,
        "out_channels": ucfg.out_channels,
        "layers_per_block": ucfg.layers_per_block,
        "block_out_channels": list(ucfg.block_out_channels),
        "down_block_types": [
            "AttnDownBlock2D" if a else "DownBlock2D" for a in ucfg.attn_down
        ],
        "up_block_types": [
            "AttnUpBlock2D" if a else "UpBlock2D" for a in ucfg.attn_up
        ],
        "attention_head_dim": ucfg.attention_head_dim,
        "norm_num_groups": ucfg.norm_groups,
        "norm_eps": ucfg.norm_eps,
        "flip_sin_to_cos": ucfg.flip_sin_to_cos,
        "freq_shift": ucfg.freq_shift,
    }


def _np(x) -> np.ndarray:
    """Dtype-preserving host array: fp16/fp32/fp64 pass through bitwise
    (import_torch maps tensors uncast, so an imported half-precision
    reference checkpoint round-trips exactly); extension dtypes numpy-
    safetensors cannot carry (ml_dtypes bf16 and friends) widen to fp32
    (value-exact, dtype not preserved)."""
    a = np.asarray(x)
    if a.dtype not in (np.float16, np.float32, np.float64):
        a = a.astype(np.float32)
    return a


def state_dict_from_params(variables: Dict[str, Any], ucfg) -> Dict[str, np.ndarray]:
    """Flax UNet2D variables tree -> flat diffusers UNet2DModel state dict.

    Exact inverse of import_torch.map_state_dict (same key vocabulary,
    models/unet.py naming on the flax side)."""
    p = variables["params"] if "params" in variables else variables
    sd: Dict[str, np.ndarray] = {}

    def conv(name, leaf):
        sd[f"{name}.weight"] = np.ascontiguousarray(
            _np(leaf["kernel"]).transpose(3, 2, 0, 1)
        )
        sd[f"{name}.bias"] = _np(leaf["bias"])

    def dense(name, leaf):
        sd[f"{name}.weight"] = np.ascontiguousarray(_np(leaf["kernel"]).T)
        sd[f"{name}.bias"] = _np(leaf["bias"])

    def norm(name, leaf):
        sd[f"{name}.weight"] = _np(leaf["scale"])
        sd[f"{name}.bias"] = _np(leaf["bias"])

    def resnet(name, leaf):
        norm(f"{name}.norm1", leaf["norm1"])
        conv(f"{name}.conv1", leaf["conv1"])
        dense(f"{name}.time_emb_proj", leaf["time_emb_proj"])
        norm(f"{name}.norm2", leaf["norm2"])
        conv(f"{name}.conv2", leaf["conv2"])
        if "conv_shortcut" in leaf:
            conv(f"{name}.conv_shortcut", leaf["conv_shortcut"])

    def attn(name, leaf):
        norm(f"{name}.group_norm", leaf["group_norm"])
        dense(f"{name}.to_q", leaf["to_q"])
        dense(f"{name}.to_k", leaf["to_k"])
        dense(f"{name}.to_v", leaf["to_v"])
        # to_out is nn.Sequential(Linear, Dropout) in diffusers
        dense(f"{name}.to_out.0", leaf["to_out"])

    dense("time_embedding.linear_1", p["time_dense1"])
    dense("time_embedding.linear_2", p["time_dense2"])
    conv("conv_in", p["conv_in"])
    n = len(ucfg.block_out_channels)
    for i in range(n):
        for j in range(ucfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", p[f"down_{i}_res_{j}"])
            if ucfg.attn_down[i]:
                attn(f"down_blocks.{i}.attentions.{j}", p[f"down_{i}_attn_{j}"])
        if i != n - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv",
                 p[f"down_{i}_downsample"]["conv"])
    resnet("mid_block.resnets.0", p["mid_res_1"])
    attn("mid_block.attentions.0", p["mid_attn"])
    resnet("mid_block.resnets.1", p["mid_res_2"])
    for i in range(n):
        for j in range(ucfg.layers_per_block + 1):
            resnet(f"up_blocks.{i}.resnets.{j}", p[f"up_{i}_res_{j}"])
            if ucfg.attn_up[i]:
                attn(f"up_blocks.{i}.attentions.{j}", p[f"up_{i}_attn_{j}"])
        if i != n - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv",
                 p[f"up_{i}_upsample"]["conv"])
    norm("conv_norm_out", p["norm_out"])
    conv("conv_out", p["conv_out"])
    return sd


def _write_pretrained(folder: str, sd: Dict[str, np.ndarray], config: dict,
                      fmt: str = "safetensors") -> None:
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    if fmt == "safetensors":
        from safetensors.numpy import save_file

        save_file(sd, os.path.join(folder, "diffusion_pytorch_model.safetensors"))
    elif fmt == "bin":
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(folder, "diffusion_pytorch_model.bin"))
    else:
        raise ValueError(f"unknown format {fmt!r} (safetensors|bin)")


def _restore_raw(path: str):
    """Restore an orbax item dir without a template (arrays come back as
    saved: host numpy, fp32 master precision)."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(path)


def export_checkpoint(
    src: str,
    out_dir: str,
    fmt: str = "safetensors",
    sample_size: Optional[int] = None,
    attention_head_dim: Optional[int] = None,
    norm_groups: Optional[int] = None,
) -> str:
    """Convert one orbax checkpoint dir into a reference checkpoint dir
    (checkpoint-epoch-N/{unet, unet_ema}) under out_dir. Returns the path."""
    src = os.path.abspath(src)
    meta: dict = {}
    meta_path = os.path.join(src, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    variables = _restore_raw(os.path.join(src, "unet"))
    params = variables["params"] if "params" in variables else variables

    saved_cfg = meta.get("unet_config") or {}

    # uniform precedence for the three config-only fields (no imprint on
    # parameter shapes): explicit argument > checkpoint meta > reference
    # default (utils/model.py:24-32)
    def pick(explicit, key, default):
        if explicit is not None:
            return explicit
        return saved_cfg.get(key, default)

    ucfg = unet_config_from_params(
        params,
        sample_size=pick(sample_size, "sample_size", 64),
        attention_head_dim=pick(attention_head_dim, "attention_head_dim", 8),
        norm_groups=pick(norm_groups, "norm_groups", 32),
    )
    config = diffusers_config_from_unet(ucfg)
    from masked_diffusion_tpu.models.unet import _norm_groups

    clamped = sorted(
        c for c in set(ucfg.block_out_channels)
        if _norm_groups(c, ucfg.norm_groups) != ucfg.norm_groups
    )
    if clamped:
        # models/unet.py:_norm_groups adjusts per-level group counts (channel
        # divisibility and the >=2-channels-per-group floor); diffusers
        # applies norm_num_groups uniformly and cannot express that — for
        # these levels torch-side loading rejects (indivisible) or silently
        # normalizes with different grouping
        import warnings

        warnings.warn(
            f"norm_groups={ucfg.norm_groups} is clamped by the flax model at "
            f"levels with channels {clamped} "
            f"(to {[_norm_groups(c, ucfg.norm_groups) for c in clamped]}); "
            "diffusers' UNet2DModel cannot express per-level group counts — "
            "the exported config.json will not load equivalently for this "
            "topology",
            stacklevel=2,
        )

    epoch = int(meta.get("epoch", 0))
    step = int(meta.get("global_step", 0))
    dst = os.path.join(os.path.abspath(out_dir), f"checkpoint-epoch-{epoch}")
    _write_pretrained(os.path.join(dst, "unet"),
                      state_dict_from_params(variables, ucfg), config, fmt)

    if "unet_ema" in meta.get("items", []) or os.path.isdir(
            os.path.join(src, "unet_ema")):
        ema_vars = _restore_raw(os.path.join(src, "unet_ema"))
        # EMAModel.save_pretrained merges its hyperparameters into
        # config.json. Fallback values are the REFERENCE's EMA flags
        # (main_train_masked.py:116-131: use_ema_warmup=True, inv_gamma=1.0,
        # power=3/4, max 0.9999 — this framework trains the same law,
        # models/ema.py); meta["ema"] (written by the Trainer and by
        # import_torch) overrides with the run's actual hyperparameters.
        ema_cfg = {**config, "decay": 0.9999, "min_decay": 0.0,
                   "optimization_step": step, "update_after_step": 0,
                   "use_ema_warmup": True, "inv_gamma": 1.0, "power": 0.75,
                   **meta.get("ema", {})}
        _write_pretrained(os.path.join(dst, "unet_ema"),
                          state_dict_from_params(ema_vars, ucfg), ema_cfg, fmt)
    return dst


def main(argv=None) -> int:
    import argparse

    from masked_diffusion_tpu.utils.platform import force_platform

    # conversion is host-side numpy work: never init (or wedge on) the TPU
    force_platform("cpu")
    ap = argparse.ArgumentParser(
        prog="python -m masked_diffusion_tpu.io.export_torch",
        description="Export an orbax checkpoint (checkpoint-epoch-N/"
        "{unet,unet_ema}) to the reference's diffusers-style torch layout.",
    )
    ap.add_argument("src", help="orbax checkpoint dir (checkpoint-epoch-N)")
    ap.add_argument("out_dir", help="directory to write the reference "
                    "checkpoint-epoch-N into")
    ap.add_argument("--format", choices=("safetensors", "bin"),
                    default="safetensors")
    ap.add_argument("--sample_size", type=int, default=None,
                    help="config.json sample_size (no imprint on weights; "
                    "default: meta.json's unet_config, else 64)")
    ap.add_argument("--attention_head_dim", type=int, default=None,
                    help="override meta.json's value (default: meta, else 8)")
    ap.add_argument("--norm_num_groups", type=int, default=None,
                    help="override meta.json's value (default: meta, else 32)")
    args = ap.parse_args(argv)
    dst = export_checkpoint(
        args.src, args.out_dir, fmt=args.format,
        sample_size=args.sample_size,
        attention_head_dim=args.attention_head_dim,
        norm_groups=args.norm_num_groups,
    )
    with open(os.path.join(dst, "unet", "config.json")) as f:
        cfg = json.load(f)
    print(f"exported -> {dst}")
    print(f"  unet: {len(os.listdir(os.path.join(dst, 'unet')))} files, "
          f"ema: {os.path.isdir(os.path.join(dst, 'unet_ema'))}")
    print(f"  config: blocks={cfg['block_out_channels']} "
          f"down={cfg['down_block_types']} up={cfg['up_block_types']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
