"""Flash-attention kernels (fwd + custom bwd) vs the XLA oracle, run in
Pallas interpret mode so they execute on the CPU CI mesh (on real TPU the
compiled kernels were verified to the same tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from valley_tpu.ops.flash_attention import _xla_attention, flash_attention


@pytest.fixture(scope="module")
def qkv():
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    B, S, H, D = 2, 256, 2, 128
    mk = lambda k: jax.random.normal(k, (B, S, H, D), jnp.float32) * 0.5
    mask = jnp.ones((B, S), jnp.int32).at[0, 200:].set(0)
    return mk(k1), mk(k2), mk(k3), mk(k4), mask


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_xla(qkv, causal):
    q, k, v, _g, mask = qkv
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, kv_mask=mask, causal=causal)
    ref = _xla_attention(q, k, v, mask, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_backward_matches_xla(qkv):
    q, k, v, g, mask = qkv

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask,
                                       causal=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask, True) * g)

    with pltpu.force_tpu_interpret_mode():   # bwd kernel traces lazily
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        scale = float(jnp.abs(b).max())
        diff = float(jnp.abs(a - b).max())
        assert diff / scale < 2e-2, (name, diff, scale)


@pytest.mark.parametrize("s,block_k", [(192, 512), (640, 128), (4096, 512)])
def test_streaming_k_forward_matches_xla(s, block_k):
    """Streaming-K + internal padding: non-128-multiple buckets (192) and
    sequences beyond the old 2048 VMEM cap (4096) match the XLA oracle."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    B, H, D = 1, 2, 128
    q = jax.random.normal(k1, (B, s, H, D), jnp.float32) * 0.5
    k = jax.random.normal(k2, (B, s, H, D), jnp.float32) * 0.5
    v = jax.random.normal(k3, (B, s, H, D), jnp.float32) * 0.5
    mask = jnp.ones((B, s), jnp.int32).at[0, s - 17:].set(0)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, kv_mask=mask, causal=True,
                              block_q=256, block_k=block_k)
    ref = _xla_attention(q, k, v, mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


def test_streaming_k_backward_matches_xla():
    """Gradients through the k-blocked backward at a non-128 length."""
    k1, k2, k3, k4 = jax.random.split(jax.random.key(2), 4)
    B, S, H, D = 1, 328, 2, 128          # 328 % 8 == 0, not % 128
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32) * 0.5
    k = jax.random.normal(k2, (B, S, H, D), jnp.float32) * 0.5
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32) * 0.5
    g = jax.random.normal(k4, (B, S, H, D), jnp.float32) * 0.5
    mask = jnp.ones((B, S), jnp.int32).at[0, 300:].set(0)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask, causal=True,
                                       block_q=128, block_k=128) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask, True) * g)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        scale = float(jnp.abs(b).max())
        diff = float(jnp.abs(a - b).max())
        assert diff / scale < 2e-2, (name, diff, scale)


def test_backward_masked_positions_get_zero_grad(qkv):
    q, k, v, g, mask = qkv

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask,
                                       causal=True) * g)

    with pltpu.force_tpu_interpret_mode():
        _dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # masked-out kv positions (row 0, >=200) must receive zero dk/dv
    assert float(jnp.abs(dk[0, 200:]).max()) == 0.0
    assert float(jnp.abs(dv[0, 200:]).max()) == 0.0
    assert float(jnp.abs(dk[0, :200]).max()) > 0.0
