"""Small utility coverage: multislice mesh fallback, trainable-param
table, semaphore printer, logger."""

import logging
import threading

import jax
import jax.numpy as jnp
import pytest

from valley_tpu import config as C
from valley_tpu.models import valley
from valley_tpu.parallel.distributed import multislice_mesh
from valley_tpu.train.trainer import TrainConfig, label_params
from valley_tpu.utils.logging import (get_logger, pretty_print_semaphore,
                                      print_trainable_params,
                                      rank_zero_info, violates_moderation)


def test_multislice_mesh_single_slice_fallback():
    mesh = multislice_mesh(fsdp=4, model=2)
    assert dict(mesh.shape) == {"data": 1, "fsdp": 4, "model": 2}


def test_multislice_mesh_rejects_bad_factorization():
    with pytest.raises(ValueError):
        multislice_mesh(fsdp=3, model=2)  # 6 != 8 per slice


def test_print_trainable_params_table():
    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    labels = label_params(params, TrainConfig(freeze_backbone=True,
                                              tune_mm_mlp_adapter=True))
    table = print_trainable_params(params, labels)
    assert "total=" in table and "trainable=" in table
    assert "projector/w" in table
    # frozen vision rows labelled frozen
    assert any("vision" in line and "frozen" in line
               for line in table.splitlines())


def test_pretty_print_semaphore():
    assert pretty_print_semaphore(None) == "None"
    sem = threading.Semaphore(3)
    out = pretty_print_semaphore(sem)
    assert "value=3" in out


def test_moderation_fails_open_without_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert violates_moderation("anything") is False


def test_get_logger_and_rank_zero(tmp_path, caplog):
    log = get_logger("t", str(tmp_path / "x.log"))
    with caplog.at_level(logging.INFO):
        rank_zero_info("hello world", log)
    assert any("hello world" in r.message for r in caplog.records)
