"""Failure detection: a non-finite loss stops training with a post-mortem
checkpoint instead of silently poisoning params/EMA (trainer.py guard)."""

import os

import numpy as np
import pytest

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic
from masked_diffusion_tpu.train.trainer import Trainer
from masked_diffusion_tpu.utils.dirs import Dir


def _tiny_cfg(**kw):
    base = dict(
        method="base", data_name="synthetic", data_size=8, batch_size=4,
        num_epochs=2, ddpm_schedule="log", ddpm_num_steps=4,
        select_degrade_pixel="indexing", mean_option="degraded_area",
        shift_type="non_shift", use_ema=False, use_wandb=False,
        block_out_channels=(8, 16), layers_per_block=1, lr_warmup_steps=0,
        sample_latent_shape="zero", sample_num=2,
    )
    base.update(kw)
    return Config(**base)


def test_nan_loss_raises_and_checkpoints(tmp_path):
    cfg = _tiny_cfg(lr=1e10)  # diverges within an epoch or two
    data, labels = make_synthetic(8, 8, seed=0)
    ds = InMemoryDataset(data, labels)
    dirs = Dir(
        task="train", content="failtest", dir_work=str(tmp_path),
        dir_dataset="", data_name="synthetic", data_set="train",
        data_size=8, method="base", title="t",
    )
    trainer = Trainer(cfg, ds)
    # force divergence deterministically: poison one input with inf
    ds.data[0, 0, 0, 0] = np.inf
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.train(0, cfg.num_epochs, dirs=dirs)
    ckpts = os.listdir(dirs.list_dir["checkpoint"])
    assert any(c.startswith("checkpoint-epoch-") for c in ckpts)
