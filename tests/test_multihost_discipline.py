"""Multi-host write discipline (VERDICT r1 missing #6): artifact writes are
gated on process 0 and the run timestamp is host-agreed — the analog of the
reference's accelerator.is_main_process gates
(trainer_masked_mean_shift.py:242, main_train_masked.py:313-319)."""

import os

import numpy as np
import pytest

from masked_diffusion_tpu.utils import host
from masked_diffusion_tpu.utils.dirs import Dir


class TestHostHelpers:
    def test_single_process_is_main(self):
        assert host.process_index() == 0
        assert host.process_count() == 1
        assert host.is_main_process()

    def test_synced_timestamp_single_process(self):
        date, time = host.synced_timestamp()
        assert len(date.split("_")) == 3
        assert len(time.split("_")) == 3


class TestDirGating:
    def test_make_dirs_false_touches_nothing(self, tmp_path):
        d = Dir(task="train", content="c", dir_work=str(tmp_path),
                data_name="synthetic", data_size=8, method="base",
                make_dirs=False)
        # the path map exists, the filesystem is untouched
        assert "checkpoint" in d.list_dir
        assert not os.path.exists(os.path.join(str(tmp_path), "result"))

    def test_make_dirs_true_creates_tree(self, tmp_path):
        d = Dir(task="train", content="c", dir_work=str(tmp_path),
                data_name="synthetic", data_size=8, method="base")
        assert os.path.isdir(d.list_dir["checkpoint"])


class TestTrainerGating:
    def test_non_main_process_writes_no_artifacts(self, tmp_path, monkeypatch):
        """With process_index forced to 1, a training run writes no PNGs,
        no meta.json sidecars — only the (collective) orbax array dirs."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.train.trainer import Trainer

        monkeypatch.setattr(host, "process_index", lambda: 1)
        assert not host.is_main_process()

        size = 8
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=16, batch_size=8, num_epochs=1,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", mean_option="degraded_area",
            shift_type="non_shift", use_ema=True, lr=1e-3,
            lr_scheduler="constant", lr_warmup_steps=0, sample_num=2,
            sample_latent_shape="zero", save_images_epochs=1,
            use_wandb=False, block_out_channels=(8, 16), layers_per_block=1,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)
        # non-main process: path map only, no mkdirs — but the trainer must
        # still survive a full epoch and make the collective checkpoint call
        dirs = Dir(task="train", content="gated", dir_work=str(tmp_path),
                   data_name="synthetic", data_size=size, method="base",
                   make_dirs=host.is_main_process())
        trainer = Trainer(cfg, dataset)
        trainer.train(0, 1, dirs=dirs)

        # no PNG artifacts anywhere in the tree
        pngs = []
        for root, _, files in os.walk(str(tmp_path)):
            pngs += [f for f in files if f.endswith(".png")]
        assert pngs == []
        # the collective orbax save ran; the process-0 sidecars did not
        ckpt_dir = dirs.list_dir["checkpoint"]
        assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint-epoch-0", "unet"))
        assert not os.path.exists(
            os.path.join(ckpt_dir, "checkpoint-epoch-0", "meta.json")
        )
