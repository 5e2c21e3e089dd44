"""Round-trip tests for the torch-checkpoint EXPORT tool (io/export_torch.py)
— the inverse of io/import_torch.py, closing the interop loop with the
reference's checkpoint layout (main_train_masked.py:195-225).

Two directions are pinned:
  torch -> flax -> torch : a reference checkpoint imported then exported must
      reproduce the ORIGINAL diffusers state dict bitwise (transposes are
      lossless), under the same tensor names diffusers emits.
  flax -> torch -> flax  : a checkpoint this framework trained (no meta
      unet_config — topology derived from the parameter tree) exported then
      re-imported must restore the original variables tree bitwise.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from masked_diffusion_tpu.io.checkpoint import save_checkpoint
from masked_diffusion_tpu.io.export_torch import (
    export_checkpoint,
    state_dict_from_params,
    unet_config_from_params,
)
from masked_diffusion_tpu.io.import_torch import (
    import_checkpoint,
    load_diffusers_folder,
    map_state_dict,
    unet_config_from_diffusers,
)
from masked_diffusion_tpu.models.unet import UNet2D, UNetConfig
from test_import_torch import (
    ATTN_DOWN,
    ATTN_UP,
    CHANNELS,
    LAYERS,
    SIZE,
    _diffusers_config,
    _twin,
    _twin_to_diffusers_sd,
    _write_pretrained,
)


def _np_sd(sd):
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


class TestTorchFlaxTorch:
    def test_import_then_export_is_bitwise(self, tmp_path):
        """Reference checkpoint -> orbax -> reference checkpoint reproduces
        every tensor bitwise under the same diffusers names."""
        tmodel, temodel = _twin(0), _twin(1)
        src = tmp_path / "checkpoint-epoch-7"
        orig_unet = _np_sd(_twin_to_diffusers_sd(tmodel))
        orig_ema = _np_sd(_twin_to_diffusers_sd(temodel))
        _write_pretrained(src / "unet", _twin_to_diffusers_sd(tmodel),
                          _diffusers_config())
        ema_cfg = {**_diffusers_config(), "decay": 0.995,
                   "optimization_step": 42, "power": 0.75}
        _write_pretrained(src / "unet_ema", _twin_to_diffusers_sd(temodel),
                          ema_cfg)

        orbax_dir = import_checkpoint(str(src), str(tmp_path / "orbax"))
        out = export_checkpoint(orbax_dir, str(tmp_path / "back"))
        assert out.endswith("checkpoint-epoch-7")

        for sub, orig in (("unet", orig_unet), ("unet_ema", orig_ema)):
            got, config = load_diffusers_folder(os.path.join(out, sub))
            # load_diffusers_folder normalizes to_out.0 -> to_out on BOTH
            # sides; compare under the normalized names
            want, _ = load_diffusers_folder(str(src / (sub)))
            assert set(got) == set(want)
            for k in want:
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)

        # config.json round-trips the topology + the EMA hyperparameters
        with open(os.path.join(out, "unet", "config.json")) as f:
            cfg = json.load(f)
        ref = _diffusers_config()
        for k in ("block_out_channels", "down_block_types", "up_block_types",
                  "layers_per_block", "in_channels", "out_channels",
                  "attention_head_dim", "norm_num_groups", "sample_size"):
            assert cfg[k] == ref[k], k
        with open(os.path.join(out, "unet_ema", "config.json")) as f:
            ecfg = json.load(f)
        assert ecfg["decay"] == 0.995
        assert ecfg["optimization_step"] == 42

        # the raw safetensors carry the diffusers Sequential index diffusers'
        # from_pretrained expects (to_out.0.weight), not our internal to_out
        from safetensors import safe_open

        with safe_open(os.path.join(out, "unet", f"diffusion_pytorch_model"
                                    ".safetensors"), framework="numpy") as f:
            keys = list(f.keys())
        assert any(k.endswith("to_out.0.weight") for k in keys)
        assert not any(k.endswith(".to_out.weight") for k in keys)


class TestFlaxTorchFlax:
    @pytest.mark.parametrize("fmt", ["safetensors", "bin"])
    def test_native_checkpoint_roundtrip(self, tmp_path, fmt):
        """A checkpoint with NO unet_config in meta (this framework's own
        trainer saves) exports via tree-derived topology and re-imports to
        the identical variables tree."""
        ucfg = UNetConfig(
            sample_size=SIZE, in_channels=1, out_channels=1,
            block_out_channels=CHANNELS, layers_per_block=LAYERS,
            attn_down=ATTN_DOWN, attn_up=ATTN_UP,
        )
        model = UNet2D(config=ucfg)
        x = np.zeros((1, SIZE, SIZE, 1), np.float32)
        t = np.zeros((1,), np.float32)
        variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x),
                               jnp.asarray(t))
        ema = jax.tree.map(lambda a: a * 0.5, variables)
        ckpt = save_checkpoint(str(tmp_path / "ckpts"), 11, 220, variables,
                               ema_params=ema)

        out = export_checkpoint(ckpt, str(tmp_path / "torch"), fmt=fmt,
                                sample_size=SIZE)
        sd, config = load_diffusers_folder(os.path.join(out, "unet"))
        got_cfg = unet_config_from_diffusers(config)
        assert got_cfg.block_out_channels == tuple(CHANNELS)
        assert got_cfg.attn_down == ATTN_DOWN and got_cfg.attn_up == ATTN_UP
        assert got_cfg.in_channels == 1 and got_cfg.out_channels == 1
        assert got_cfg.layers_per_block == LAYERS

        back = map_state_dict(sd, got_cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(variables)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path))

        # EMA folder restores too, with defaulted hyperparameters + the step
        ema_sd, ema_cfg = load_diffusers_folder(os.path.join(out, "unet_ema"))
        assert ema_cfg["optimization_step"] == 220
        back_ema = map_state_dict(ema_sd, got_cfg)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(back_ema)[0]),
            np.asarray(jax.tree_util.tree_leaves(ema)[0]))

    def test_trainer_checkpoint_exports_exact_config(self, tmp_path):
        """The trainer records the model topology in meta.json
        (train/trainer.py:_unet_meta), so exporting a natively-trained
        checkpoint emits the TRUE sample_size / attention_head_dim /
        norm_num_groups instead of guessed defaults (norm_groups=8 here
        would otherwise export as 32 — wrong for diffusers)."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.io.checkpoint import find_resume_checkpoint
        from masked_diffusion_tpu.train.trainer import Trainer
        from masked_diffusion_tpu.utils.dirs import Dir

        size = 8
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=8, batch_size=8, num_epochs=1,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", mean_option="degraded_area",
            mean_area="image-wise", shift_type="non_shift", use_ema=True,
            block_out_channels=(8, 16), layers_per_block=1,
            save_images_epochs=1, sample_num=2, sample_latent_shape="zero",
            use_wandb=False, use_mlflow=False, dir_work=str(tmp_path),
        )
        model = UNet2D(config=UNetConfig(
            sample_size=size, in_channels=3, out_channels=3,
            block_out_channels=(8, 16), layers_per_block=1,
            attn_down=(False, True), attn_up=(True, False), norm_groups=8,
        ))
        dataset = get_dataset("", "synthetic", size, data_subset=True,
                              num_data=8)
        dirs = Dir(task="train", content="exp", dir_work=str(tmp_path),
                   data_name="synthetic", data_size=size, method=cfg.method)
        trainer = Trainer(cfg, dataset, model=model)
        trainer.train(0, 1, dirs=dirs)

        ckpt = find_resume_checkpoint(dirs.list_dir["checkpoint"], "latest")
        assert ckpt is not None
        with open(os.path.join(ckpt, "meta.json")) as f:
            meta = json.load(f)
        assert meta["unet_config"]["norm_groups"] == 8
        assert meta["unet_config"]["sample_size"] == size

        # the trainer also records its EMA hyperparameters (the diffusers
        # EMAModel warmup law the reference configures,
        # main_train_masked.py:116-131) so a reference-side fine-tune
        # continues the same decay curve
        assert meta["ema"] == {
            "decay": cfg.ema_max_decay, "min_decay": 0.0,
            "use_ema_warmup": True, "inv_gamma": cfg.ema_inv_gamma,
            "power": cfg.ema_power, "update_after_step": 0,
        }

        out = export_checkpoint(ckpt, str(tmp_path / "torch"))
        with open(os.path.join(out, "unet", "config.json")) as f:
            dcfg = json.load(f)
        assert dcfg["norm_num_groups"] == 8
        assert dcfg["sample_size"] == size
        assert dcfg["block_out_channels"] == [8, 16]
        with open(os.path.join(out, "unet_ema", "config.json")) as f:
            ecfg = json.load(f)
        assert ecfg["use_ema_warmup"] is True
        assert ecfg["power"] == cfg.ema_power
        assert ecfg["decay"] == cfg.ema_max_decay

        # explicit CLI-style overrides beat the recorded meta uniformly
        out2 = export_checkpoint(ckpt, str(tmp_path / "torch2"),
                                 attention_head_dim=16)
        with open(os.path.join(out2, "unet", "config.json")) as f:
            dcfg2 = json.load(f)
        assert dcfg2["attention_head_dim"] == 16
        assert dcfg2["norm_num_groups"] == 8  # meta still wins when not given

    def test_half_precision_checkpoint_roundtrips_bitwise(self, tmp_path):
        """diffusers ships many released checkpoints in fp16; import maps
        tensors uncast, and export must preserve the stored dtype so the
        torch->flax->torch path stays bitwise for them too
        (export_torch._np)."""
        tmodel = _twin(5).half()
        src = tmp_path / "checkpoint-epoch-3"
        _write_pretrained(src / "unet", _twin_to_diffusers_sd(tmodel),
                          _diffusers_config())
        orbax_dir = import_checkpoint(str(src), str(tmp_path / "orbax"))
        out = export_checkpoint(orbax_dir, str(tmp_path / "back"))
        got, _ = load_diffusers_folder(os.path.join(out, "unet"))
        want, _ = load_diffusers_folder(str(src / "unet"))
        for k in want:
            w = np.asarray(want[k])
            g = np.asarray(got[k])
            assert g.dtype == w.dtype == np.float16, k
            np.testing.assert_array_equal(g, w, err_msg=k)

    def test_export_inverts_import_mapping_shapes(self):
        """state_dict_from_params/map_state_dict are structural inverses:
        conv HWIO<->OIHW, dense transpose, norm scale<->weight."""
        ucfg = UNetConfig(
            sample_size=SIZE, in_channels=3, out_channels=3,
            block_out_channels=(8, 16), layers_per_block=1,
            attn_down=(False, True), attn_up=(True, False), norm_groups=4,
        )
        model = UNet2D(config=ucfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, SIZE, SIZE, 3)), jnp.zeros((1,)))
        sd = state_dict_from_params(variables, ucfg)
        assert sd["conv_in.weight"].shape == (8, 3, 3, 3)  # OIHW
        assert sd["time_embedding.linear_1.weight"].shape[1] == 8  # (out,in)
        # derivation from the tree recovers the config
        derived = unet_config_from_params(
            variables["params"], sample_size=SIZE, norm_groups=4)
        assert derived.block_out_channels == (8, 16)
        assert derived.attn_down == (False, True)
        assert derived.attn_up == (True, False)
        assert derived.layers_per_block == 1
