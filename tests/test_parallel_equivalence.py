"""Distributed-correctness: training on a sharded mesh must reproduce the
single-device loss trajectory (ZeRO/TP as sharding rules change layout,
never math)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from valley_tpu import config as C
from valley_tpu.models import valley
from valley_tpu.parallel import create_mesh, shard_batch, shard_params
from valley_tpu.train.trainer import TrainConfig, make_optimizer


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


def _batches(cfg, n_steps=3, batch=8, seq=32):
    rng = np.random.default_rng(7)
    tok = cfg.tokens
    p = cfg.num_patches
    out = []
    for _ in range(n_steps):
        ids = rng.integers(5, 400, size=(batch, seq))
        span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
            [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
        ids[:, 1:1 + len(span)] = span
        images = rng.standard_normal(
            (batch, 2, 3, cfg.vision.image_size,
             cfg.vision.image_size)).astype(np.float32)
        labels = np.where(ids > 4, ids, -100)
        out.append({"input_ids": jnp.asarray(ids),
                    "images": jnp.asarray(images),
                    "labels": jnp.asarray(labels),
                    "attention_mask": jnp.ones((batch, seq), jnp.int32)})
    return out


def _run(cfg, mesh_shape, batches):
    params = valley.init_params(cfg, jax.random.key(5), jnp.float32)
    tc = TrainConfig(learning_rate=1e-3, freeze_backbone=False,
                     tune_mm_mlp_adapter=True)
    tx, _s, _l = make_optimizer(params, tc, total_steps=len(batches))
    mesh = create_mesh(*mesh_shape)

    with mesh:
        params = shard_params(mesh, params)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                return valley.loss_fn(p, cfg, batch, remat=False)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for b in batches:
            b = shard_batch(mesh, b)
            params, opt_state, loss = step(params, opt_state, b)
            losses.append(float(loss))
    return losses


def test_sharded_training_matches_single_device(cfg):
    batches = _batches(cfg)
    ref = _run(cfg, (1, 1, 1), batches)
    for shape in [(1, 8, 1), (2, 2, 2), (1, 2, 4)]:
        got = _run(cfg, shape, batches)
        np.testing.assert_allclose(got, ref, rtol=2e-4,
                                   err_msg=f"mesh {shape}")
    # training actually progressed
    assert ref[-1] < ref[0]
