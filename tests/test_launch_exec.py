"""Execute one launch-farm script end-to-end (VERDICT r4 next-step 7).

test_launch_scripts proves every scripts/train/** flag set PARSES; this test
proves the farm contract actually RUNS: scripts/train/mnist/masked_base/
script_main.sh is executed as a real subprocess (bash -> python -m ...cli)
against a synthesized MNIST IDX dataset (the torchvision raw layout
data/datasets.load_mnist_idx reads), scaled down through the script's MDT_*
env knobs + MDT_EXTRA_ARGS, on the forced-CPU backend (MDT_PLATFORM, the
round-4 CLI override). Asserts the reference run-tree artifacts land:
option.ini (main_train_masked.py:338-343), checkpoint-epoch-N
(trainer_masked.py:267-268 layout), and the metrics JSONL sink.
"""

import glob
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(
    REPO, "scripts", "train", "mnist", "masked_base", "script_main.sh"
)


def _write_mnist_idx(root: str, n: int = 48, size: int = 28) -> None:
    """Synthesize a tiny MNIST in the torchvision raw-IDX layout."""
    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(n, size, size), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(n,)).astype(np.uint8)
    for prefix in ("train", "t10k"):
        with open(os.path.join(raw, f"{prefix}-images-idx3-ubyte"), "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, size, size))
            f.write(images.tobytes())
        with open(os.path.join(raw, f"{prefix}-labels-idx1-ubyte"), "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())


@pytest.mark.slow
def test_mnist_masked_base_script_executes(tmp_path):
    data_dir = tmp_path / "dataset"
    work_dir = tmp_path / "work"
    _write_mnist_idx(str(data_dir))
    os.makedirs(work_dir, exist_ok=True)

    env = dict(
        os.environ,
        MDT_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        MDT_DIR_DATASET=str(data_dir),
        MDT_DIR_WORK=str(work_dir),
        MDT_DATA_SUBSET_NUM="32",
        MDT_BATCH_SIZE="8",
        MDT_NUM_EPOCHS="2",
        MDT_DDPM_NUM_STEPS="6",
        MDT_SAMPLE_NUM="2",
        MDT_SAVE_IMAGES_EPOCHS="2",
        MDT_MIXED_PRECISION="no",
        MDT_EXTRA_ARGS=(
            "--block_out_channels 8,16 --layers_per_block 1 "
            "--lr_warmup_steps 0 --sample_latent_shape zero"
        ),
    )
    r = subprocess.run(
        ["bash", SCRIPT], env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"script failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"

    runs = glob.glob(
        str(work_dir / "result" / "mnist_masked" / "mnist" / "base" / "*" / "base_log")
    )
    assert len(runs) == 1, f"run tree missing: {runs}"
    run = runs[0]
    assert os.path.exists(os.path.join(run, "option", "option.ini"))
    ckpts = glob.glob(os.path.join(run, "checkpoint", "checkpoint-epoch-*"))
    assert ckpts, "no checkpoint written by the save cadence"
    metrics = glob.glob(os.path.join(run, "log", "**", "metrics.jsonl"), recursive=True)
    assert metrics, "metrics JSONL sink missing"
    # the cadence also renders EMA sample grids (trainer._save_ema_* family)
    images = glob.glob(os.path.join(run, "train", "image", "**", "*.png"), recursive=True)
    assert images, "no sample/visual PNGs written"


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
