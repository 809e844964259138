"""HF-hub streaming dataset reader (reference from_hf_repo,
train_dataset.py:65-105) — unit-tested against a stubbed `datasets` module
(network-blocked environment)."""

import sys
import types

import pytest

from visrag_tpu.data import datasets as D


@pytest.fixture
def fake_datasets(monkeypatch):
    calls = {}

    class _Split:
        num_examples = 7

    class _Info:
        splits = {"train": _Split(), "test": _Split()}

    class _Builder:
        info = _Info()

    mod = types.ModuleType("datasets")

    def load_dataset(name, split=None, streaming=False):
        calls["load"] = (name, split, streaming)
        return iter([{"query": "q1", "image": None},
                     {"query": "q2", "image": None}])

    mod.load_dataset = load_dataset
    mod.load_dataset_builder = lambda name: _Builder()
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return calls


def test_is_hf_repo():
    assert D.is_hf_repo("openbmb/VisRAG-Ret-Train-In-domain-data")
    assert D.is_hf_repo("openbmb/VisRAG-Ret-Test-ArxivQA@test")
    assert not D.is_hf_repo("/tmp/data.parquet")
    assert not D.is_hf_repo("data.parquet")
    # a MISSING local path with a data extension is a typo, not a hub spec
    assert not D.is_hf_repo("data/definitely_missing.parquet")
    assert not D.is_hf_repo("shards/train.jsonl@test")
    # an existing relative dir with a slash is local, not hub
    assert not D.is_hf_repo("tests/../tests")


def test_iter_rows_hub_spec_streams(fake_datasets):
    rows = list(D.iter_rows("org/name@test"))
    assert [r["query"] for r in rows] == ["q1", "q2"]
    assert fake_datasets["load"] == ("org/name", "test", True)


def test_default_split_is_train(fake_datasets):
    list(D.iter_rows("org/name"))
    assert fake_datasets["load"] == ("org/name", "train", True)


def test_dataset_length_from_hub_info(fake_datasets):
    assert D.dataset_length("org/name") == 7
    assert D.dataset_length("org/name@test") == 7


def test_train_dataset_over_hub_spec(fake_datasets):
    ds = D.MMDRTrainDataset("org/name")
    assert len(ds) == 7              # hub split info
    items = list(ds)
    assert items[0]["query"][0].startswith(D.QUERY_INSTRUCTION)
    assert items[0]["query"][0].endswith("q1")


def test_missing_datasets_package_is_loud(monkeypatch):
    monkeypatch.setitem(sys.modules, "datasets", None)
    with pytest.raises(ImportError, match="hub"):
        list(D.iter_rows("org/name"))
