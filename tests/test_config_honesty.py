"""Config honesty: no silently-dead fields (VERDICT round-2 weak #4).

The reference at least raises on biaxial_loss=True (dense_trainer.py:437-438)
while silently ignoring inbatch_loss (arguments.py:179). Here both misuses
raise, and a sweep asserts every dataclass field name is referenced somewhere
in package source outside config.py — a tripwire against fields that nothing
consumes."""

import dataclasses
import os
import re

import pytest

import visrag_tpu.config as C

PKG = os.path.dirname(C.__file__)


def test_biaxial_loss_raises():
    from visrag_tpu.config import TrainConfig
    from visrag_tpu.training.trainer import make_train_step
    import optax
    cfg = TrainConfig(biaxial_loss=True)
    with pytest.raises(NotImplementedError, match="biaxial"):
        make_train_step(lambda p, b, r: None, cfg, optax.sgd(1e-3))


def test_inbatch_loss_false_raises():
    from visrag_tpu.config import TrainConfig
    from visrag_tpu.training.trainer import make_train_step
    import optax
    cfg = TrainConfig(inbatch_loss=False)
    with pytest.raises(NotImplementedError, match="inbatch"):
        make_train_step(lambda p, b, r: None, cfg, optax.sgd(1e-3))


def _package_source():
    chunks = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py") and f != "config.py":
                with open(os.path.join(root, f)) as fh:
                    chunks.append(fh.read())
    return "\n".join(chunks)


def test_every_config_field_is_consumed():
    """Every field of every config dataclass must appear (as an attribute or
    key) in package source outside config.py. A field only config.py knows
    about is a silent no-op waiting to happen."""
    src = _package_source()
    configs = [obj for name, obj in vars(C).items()
               if dataclasses.is_dataclass(obj) and isinstance(obj, type)]
    assert len(configs) >= 10   # the tree exists
    missing = []
    for cls in configs:
        for f in dataclasses.fields(cls):
            # consumed as .name, ["name"], name= or cfg-dotlist "name"
            pat = re.compile(r"[.\"' (]" + re.escape(f.name)
                             + r"(?![A-Za-z0-9_])")
            if not pat.search(src):
                missing.append(f"{cls.__name__}.{f.name}")
    assert not missing, (
        f"config fields never referenced outside config.py: {missing} — "
        "wire them or delete them")
