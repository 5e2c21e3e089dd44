"""HuggingFace adapter (data/hugging.py) against an in-memory HF dataset —
no network: datasets.Dataset.from_dict stands in for the hub, and
load_dataset is monkeypatched to honor the reference's split-slicing
expression (datasetutilsHugging.py:103)."""

import re

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from masked_diffusion_tpu.data import hugging


@pytest.fixture
def fake_hub(monkeypatch):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (12, 12), dtype=np.uint8) for _ in range(10)]
    ds = datasets.Dataset.from_dict(
        {"image": imgs, "label": list(range(10))}
    )

    calls = {}

    def fake_load_dataset(name, split=None):
        calls["name"], calls["split"] = name, split
        m = re.match(r"^(\w+)\[(\d+):(\d+)\]$", split or "")
        if m:
            return ds.select(range(int(m.group(2)), int(m.group(3))))
        return ds

    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)
    return calls


def test_load_mnist_like(fake_hub):
    out = hugging.load_hf_dataset("mnist", size=8, split="train")
    assert fake_hub["name"] == "mnist"
    assert out.data.shape == (10, 8, 8, 1)
    assert out.data.min() >= -1.0 and out.data.max() <= 1.0
    np.testing.assert_array_equal(out.labels, np.arange(10))


def test_split_slicing(fake_hub):
    out = hugging.load_hf_dataset(
        "mnist", size=8, split="train", data_subset=True, num_data=4
    )
    assert fake_hub["split"] == "train[0:4]"
    assert len(out) == 4


def test_metfaces_name_mapping(fake_hub):
    hugging.load_hf_dataset("metfaces", size=8)
    assert fake_hub["name"] == "huggan/metfaces"


def test_unknown_name_raises(fake_hub):
    with pytest.raises(ValueError, match="unsupported"):
        hugging.load_hf_dataset("imagenet", size=8)


def test_get_dataset_label_filter_rejected_on_hf_path():
    from masked_diffusion_tpu.data.datasets import get_dataset

    with pytest.raises(NotImplementedError, match="label_filter"):
        get_dataset("/data_hugging", "mnist", 8, label_filter=3)
