"""Optimizer host-offload (ZeRO-offload equivalent): identical numerics
to the on-device optimizer, state placed in pinned host memory.

Reference: `valley/configs/deepspeed/config_zero3_offload.json:34-43`
(offload_param / offload_optimizer device=cpu).  Here the optimizer state
carries `memory_kind="pinned_host"` shardings and streams around each
jitted update (`train/trainer.py`, TrainConfig.offload_optimizer).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.models import valley
from valley_tpu.train.trainer import TrainConfig, Trainer

from tests.test_train import make_loader


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def _run(cfg, params, tmp_path, name, offload):
    tc = TrainConfig(output_dir=str(tmp_path / name), learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=2, per_device_train_batch_size=4,
                     gradient_checkpointing=False, save_steps=0,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2,
                     offload_optimizer=offload)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params),
                      make_loader(cfg))
    trainer.train(resume=False)
    with open(trainer._metrics_path) as f:
        losses = [eval(line.replace("null", "None"))["loss"] for line in f]
    return trainer, losses


def test_offload_matches_on_device(cfg, params, tmp_path):
    t_dev, losses_dev = _run(cfg, params, tmp_path, "dev", offload=False)
    t_off, losses_off = _run(cfg, params, tmp_path, "off", offload=True)
    # same math, but grads/update compile as separate executables in the
    # offload path, so fusion order may differ by float ulps
    np.testing.assert_allclose(np.asarray(losses_dev),
                               np.asarray(losses_off), rtol=1e-5)
    w_dev = np.asarray(jax.device_get(t_dev.state.params["projector"]["w"]))
    w_off = np.asarray(jax.device_get(t_off.state.params["projector"]["w"]))
    np.testing.assert_allclose(w_dev, w_off, atol=1e-6, rtol=1e-5)

    # state actually lives in host memory
    kinds = {getattr(x.sharding, "memory_kind", None)
             for x in jax.tree.leaves(t_off.state.opt_state)}
    assert kinds == {"pinned_host"}, kinds
    kinds_dev = {getattr(x.sharding, "memory_kind", None)
                 for x in jax.tree.leaves(t_dev.state.opt_state)}
    assert "pinned_host" not in kinds_dev


def test_offload_resume_roundtrip(cfg, params, tmp_path):
    tc = TrainConfig(output_dir=str(tmp_path / "ckpt"), learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=1, per_device_train_batch_size=4,
                     save_steps=2, gradient_checkpointing=False,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2,
                     offload_optimizer=True)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params),
                      make_loader(cfg))
    steps = trainer.train(resume=False)
    assert steps == 2

    trainer2 = Trainer(cfg, dataclasses.replace(tc),
                       jax.tree.map(jnp.copy, params), make_loader(cfg))
    assert trainer2.maybe_resume() == 2
    kinds = {getattr(x.sharding, "memory_kind", None)
             for x in jax.tree.leaves(trainer2.state.opt_state)}
    assert kinds == {"pinned_host"}, kinds
    a = jax.tree.leaves(jax.device_get(trainer.state.opt_state))
    b = jax.tree.leaves(jax.device_get(trainer2.state.opt_state))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
