"""Rotary position embeddings (LLaMA style, half-split layout).

Matches the HF LLaMA rotate-half convention the reference model inherits
through `LlamaModel` (`valley/model/valley_model.py:249-254` delegates to it):
cos/sin tables of shape (S, head_dim) built from theta^(-2i/d), applied as
``x * cos + rotate_half(x) * sin`` with fp32 tables for fidelity.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int,
                 theta: float = 10000.0, scaling: float = 1.0
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer ``positions`` (any shape), fp32.

    Returns arrays of shape ``positions.shape + (head_dim,)`` where the
    frequency vector is tiled twice along the last axis (HF layout).

    ``scaling`` > 1 is linear position interpolation (Chen et al. 2023,
    arXiv 2306.15595): positions are divided by the factor so a model
    trained to ``max_position_embeddings`` addresses
    ``scaling x`` longer contexts inside its trained angle range —
    position 2k at scaling 2 lands exactly on trained position k.
    Quality at >1 assumes the usual brief PI fine-tune.
    """
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    pos = positions.astype(jnp.float32)
    if scaling != 1.0:
        pos = pos / jnp.float32(scaling)
    angles = pos[..., None] * inv_freq                            # (..., d/2)
    angles = jnp.concatenate([angles, angles], axis=-1)           # (..., d)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """Apply rotary embedding.

    x: (..., S, H, D); cos/sin: (..., S, D) broadcast over the head axis.
    Computation in fp32, result cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)
