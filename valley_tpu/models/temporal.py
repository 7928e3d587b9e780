"""Temporal aggregation of per-frame patch features.

Re-implements the three Valley pooling variants
(`valley/model/valley_model.py:27-52,104-133,206-213`) as pure functions
over a (T, P, H) feature block:

* v1 ``mean`` / ``max``  — reduce over the frame axis;
* v2 ``temporal_importance`` — Linear(P*H -> 1) scores per frame,
  softmax over frames, weighted sum (`text_importance_pooling`, `:113-121`);
* v3 ``temporal_transformer`` — a 1-layer post-norm transformer encoder over
  the time axis per patch (torch `nn.TransformerEncoderLayer` defaults:
  ffn 2048, ReLU, eps 1e-5), last-time-step output plus the temporal mean
  (`temporal_tranforemr_delta_adding`, `:123-133`), with the **sinusoidal**
  position table (the `initialize_vision_modules` branch at `:89`; the
  zeros-init `__init__` branch at `:51` is a reference quirk not kept).

All math in fp32 internally; batched via `jax.vmap` in the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from valley_tpu.config import ValleyConfig


def sinusoidal_position_matrix(seq_len: int, d: int,
                               n: float = 10000.0) -> jnp.ndarray:
    """P[k, 2i] = sin(k/n^(2i/d)), P[k, 2i+1] = cos(k/n^(2i/d))
    (`valley_model.py:104-111`)."""
    k = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    i = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
    denom = n ** (2 * i / d)
    angles = k / denom
    out = jnp.zeros((seq_len, d), jnp.float32)
    out = out.at[:, 0::2].set(jnp.sin(angles))
    out = out.at[:, 1::2].set(jnp.cos(angles))
    return out


def init_params(cfg: ValleyConfig, key: jax.Array, dtype=jnp.bfloat16):
    """Params for the configured pooling method ({} for mean/max)."""
    h = cfg.text.hidden_size
    method = cfg.patch_pooling_method
    if method in ("mean", "max"):
        return {}
    if method == "temporal_importance":
        p = cfg.num_patches
        w = jax.random.normal(key, (p * h, 1), jnp.float32) * (p * h) ** -0.5
        return {"pooling_w": w.astype(dtype), "pooling_b": jnp.zeros((1,), dtype)}
    if method == "temporal_transformer":
        keys = iter(jax.random.split(key, 8))

        def dense(k, fan_in, shape):
            return (jax.random.normal(k, shape, jnp.float32)
                    * (fan_in ** -0.5)).astype(dtype)

        f = cfg.temporal_transformer_ffn
        return {
            "wq": dense(next(keys), h, (h, h)), "bq": jnp.zeros((h,), dtype),
            "wk": dense(next(keys), h, (h, h)), "bk": jnp.zeros((h,), dtype),
            "wv": dense(next(keys), h, (h, h)), "bv": jnp.zeros((h,), dtype),
            "wo": dense(next(keys), h, (h, h)), "bo": jnp.zeros((h,), dtype),
            "ln1_scale": jnp.ones((h,), dtype), "ln1_bias": jnp.zeros((h,), dtype),
            "ln2_scale": jnp.ones((h,), dtype), "ln2_bias": jnp.zeros((h,), dtype),
            "ffn1": dense(next(keys), h, (h, f)), "ffn1_bias": jnp.zeros((f,), dtype),
            "ffn2": dense(next(keys), f, (f, h)), "ffn2_bias": jnp.zeros((h,), dtype),
            # Frozen sinusoidal table; stored so checkpoints round-trip.
            "position_matrix": sinusoidal_position_matrix(
                cfg.temporal_pos_len, h).astype(dtype),
        }
    raise ValueError(f"unknown pooling method {method!r}")


def _post_norm_ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias


def _encoder_layer_post_norm(tp, x, num_heads: int, key_mask=None):
    """torch nn.TransformerEncoderLayer with norm_first=False, eval mode.

    x: (B, T, H) fp32.  ``key_mask``: optional (T,) bool — padded time
    steps are excluded as attention keys.
    """
    b, t, h = x.shape
    d = h // num_heads
    q = (x @ tp["wq"].astype(jnp.float32) + tp["bq"].astype(jnp.float32))
    k = (x @ tp["wk"].astype(jnp.float32) + tp["bk"].astype(jnp.float32))
    v = (x @ tp["wv"].astype(jnp.float32) + tp["bv"].astype(jnp.float32))
    q = q.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
    if key_mask is not None:
        logits = jnp.where(key_mask[None, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h)
    attn = attn @ tp["wo"].astype(jnp.float32) + tp["bo"].astype(jnp.float32)
    x = _post_norm_ln(x + attn, tp["ln1_scale"].astype(jnp.float32),
                      tp["ln1_bias"].astype(jnp.float32))
    ff = jax.nn.relu(x @ tp["ffn1"].astype(jnp.float32)
                     + tp["ffn1_bias"].astype(jnp.float32))
    ff = ff @ tp["ffn2"].astype(jnp.float32) + tp["ffn2_bias"].astype(jnp.float32)
    return _post_norm_ln(x + ff, tp["ln2_scale"].astype(jnp.float32),
                         tp["ln2_bias"].astype(jnp.float32))


def pool_patches(tparams, cfg: ValleyConfig, patch_features: jnp.ndarray,
                 frame_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(T, P, H) per-frame patch features -> (P, H) pooled features.

    ``frame_mask``: optional (T,) bool marking valid frames.  Mixed
    image/video batches are frame-padded to a common T for static shapes;
    masked pooling keeps the math identical to the reference's per-sample
    variable-T loop (all-ones mask == unmasked path).  Padding must sit at
    the END of the frame axis (the transformer variant reads the last
    *valid* step).
    """
    method = cfg.patch_pooling_method
    x = patch_features
    t = x.shape[0]
    if frame_mask is None:
        m = None
    else:
        m = frame_mask.astype(jnp.float32)                  # (T,)

    if method == "mean":
        if m is None:
            return jnp.mean(x, axis=0)
        w = m[:, None, None]
        return (jnp.sum(x.astype(jnp.float32) * w, axis=0)
                / jnp.maximum(jnp.sum(m), 1.0)).astype(x.dtype)
    if method == "max":
        if m is None:
            return jnp.max(x, axis=0)
        neg = jnp.asarray(-1e30, x.dtype)
        masked = jnp.where(frame_mask[:, None, None], x, neg)
        return jnp.max(masked, axis=0)
    if method == "temporal_importance":
        flat = x.reshape(t, -1).astype(jnp.float32)
        score = flat @ tparams["pooling_w"].astype(jnp.float32) \
            + tparams["pooling_b"].astype(jnp.float32)      # (T, 1)
        if m is not None:
            score = jnp.where(m[:, None] > 0, score, -1e30)
        score = jax.nn.softmax(score, axis=0)[:, :, None]   # (T, 1, 1)
        return jnp.sum(score * x.astype(jnp.float32),
                       axis=0).astype(x.dtype)
    if method == "temporal_transformer":
        xt = x.transpose(1, 0, 2).astype(jnp.float32)       # (P, T, H)
        pos = tparams["position_matrix"][:t].astype(jnp.float32)[None]
        enc = _encoder_layer_post_norm(tparams, xt + pos,
                                       cfg.temporal_transformer_heads,
                                       key_mask=frame_mask)
        if m is None:
            delta = enc[:, -1, :]                           # (P, H)
            mean = jnp.mean(xt, axis=1)                     # (P, H)
        else:
            last = jnp.maximum(jnp.sum(m).astype(jnp.int32) - 1, 0)
            delta = enc[:, last, :]
            mean = (jnp.sum(xt * m[None, :, None], axis=1)
                    / jnp.maximum(jnp.sum(m), 1.0))
        return (delta + mean).astype(x.dtype)
    raise ValueError(f"unknown pooling method {method!r}")
