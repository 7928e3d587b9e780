"""CLIP ViT-L/14 vision encoder (openai/clip-vit-large-patch14).

TPU-native re-design of the frozen tower the reference loads through HF
`CLIPVisionModel` (`valley/model/valley_model.py:38,63-71`):

* the stride-14 patch conv is expressed as reshape + one (256, 588)x(588, H)
  matmul — identical math, lands on the MXU instead of a conv kernel;
* layers are stacked and scanned; since Valley taps hidden state -2
  (`mm_vision_select_layer: -2`, `valley_stage1.yaml:35`) the final layer
  and post-layernorm are **never computed** — the stack simply runs
  ``num_layers + select_layer + 1`` layers;
* LayerNorm/softmax in fp32; quickGELU activation (x * sigmoid(1.702x))
  matching CLIP, not the GELU used by LLaMA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from valley_tpu.config import VisionConfig
from valley_tpu.ops.attention import mha_attention

# CLIP preprocessing statistics (`valley/util/data_util.py:272-273`).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def init_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 12))

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    h, f = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "class_embedding": dense(next(keys), h, (h,)),
        "patch_embedding": dense(next(keys), patch_dim, (patch_dim, h)),
        "position_embedding": dense(next(keys), h, (cfg.num_positions, h)),
        "pre_ln_scale": jnp.ones((h,), dtype),
        "pre_ln_bias": jnp.zeros((h,), dtype),
        "layers": {
            "ln1_scale": jnp.ones((L, h), dtype),
            "ln1_bias": jnp.zeros((L, h), dtype),
            "wq": dense(next(keys), h, (L, h, h)),
            "bq": jnp.zeros((L, h), dtype),
            "wk": dense(next(keys), h, (L, h, h)),
            "bk": jnp.zeros((L, h), dtype),
            "wv": dense(next(keys), h, (L, h, h)),
            "bv": jnp.zeros((L, h), dtype),
            "wo": dense(next(keys), h, (L, h, h)),
            "bo": jnp.zeros((L, h), dtype),
            "ln2_scale": jnp.ones((L, h), dtype),
            "ln2_bias": jnp.zeros((L, h), dtype),
            "fc1": dense(next(keys), h, (L, h, f)),
            "fc1_bias": jnp.zeros((L, f), dtype),
            "fc2": dense(next(keys), f, (L, f, h)),
            "fc2_bias": jnp.zeros((L, h), dtype),
        },
    }


def layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed.astype(x.dtype) * scale + bias)


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _activation(x, name: str):
    if name == "quick_gelu":
        return quick_gelu(x)
    if name == "gelu":
        return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
            x.dtype)
    raise ValueError(f"unsupported vision activation {name!r}")


def _patchify(pixel_values: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, num_patches, 3*p*p) in conv-weight dot order
    (in_ch, kh, kw), row-major patch grid — bit-identical to the torch
    Conv2d(stride=patch) + flatten(2).transpose(1, 2) pipeline."""
    b, c, hh, ww = pixel_values.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = pixel_values.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * p * p)


def _dot(lp, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """``x @ lp[name]`` with optional int8 weights (w stored (in, out),
    scale (1, out) after the scan's layer slice —
    `ops.quant.quantize_vision_params`).

    ``<name>_scale``: weight-only dequant-dot (int8 weights load as bf16
    operands, fp32 accumulate — same scheme as `llama._proj`).
    ``<name>_scale_a8``: W8A8 — per-token int8 activation quant + int8
    MXU dot (the tower only ever runs prefill-shaped 257-token matmuls,
    so unlike the LLM there is no sequence-length gate; every tower call
    takes the fast path)."""
    w = lp[name]
    if w.dtype != jnp.int8:
        return x @ w
    a8_scale = lp.get(name + "_scale_a8")
    scale = lp[name + "_scale"] if a8_scale is None else a8_scale
    b, s, k = x.shape
    o = w.shape[-1]
    if a8_scale is not None:
        xf = x.reshape(b * s, k).astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                           1e-6)
        ascale = amax / 127.0
        xq = jnp.round(xf / ascale).astype(jnp.int8)
        y = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * ascale * scale.astype(jnp.float32)
        return out.reshape(b, s, o).astype(x.dtype)
    y = jax.lax.dot_general(x, w.astype(x.dtype),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _encoder_layer(lp, x, cfg: VisionConfig):
    b, s, h = x.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim

    residual = x
    x = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
    q = (_dot(lp, "wq", x) + lp["bq"]).reshape(b, s, nh, d)
    k = (_dot(lp, "wk", x) + lp["bk"]).reshape(b, s, nh, d)
    v = (_dot(lp, "wv", x) + lp["bv"]).reshape(b, s, nh, d)
    attn = mha_attention(q, k, v, causal=False, use_flash=False)
    x = residual + (_dot(lp, "wo", attn.reshape(b, s, h)) + lp["bo"])

    residual = x
    x = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
    x = _dot(lp, "fc2", _activation(_dot(lp, "fc1", x) + lp["fc1_bias"],
                                    cfg.hidden_act)) + lp["fc2_bias"]
    return residual + x


def encode(params, cfg: VisionConfig, pixel_values: jnp.ndarray,
           select_layer: Optional[int] = None) -> jnp.ndarray:
    """Encode images to the tapped hidden state.

    pixel_values: (B, 3, H, W), CLIP-normalized.  Returns (B, 1+P, hidden):
    CLS token at index 0 then the patch grid — exactly the tensor the
    reference reads from ``hidden_states[select_layer]``
    (`valley_model.py:173-183`).
    """
    if select_layer is None:
        select_layer = cfg.select_layer
    # hidden_states[i] == output of layer i-1 (index 0 = embeddings), so a
    # negative tap -n means the last (n-1) layers are dead code.
    if select_layer < 0:
        num_layers = cfg.num_hidden_layers + select_layer + 1
    else:
        num_layers = select_layer
    num_layers = max(0, min(num_layers, cfg.num_hidden_layers))

    patches = _patchify(pixel_values, cfg).astype(
        params["patch_embedding"].dtype)
    x = patches @ params["patch_embedding"]                  # (B, P, H)
    cls = jnp.broadcast_to(params["class_embedding"],
                           (x.shape[0], 1, cfg.hidden_size))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)    # (B, 1+P, H)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                   cfg.layer_norm_eps)

    def body(h, lp):
        return _encoder_layer(lp, h, cfg), None

    layers = jax.tree.map(lambda a: a[:num_layers], params["layers"])
    x, _ = jax.lax.scan(body, x, layers)
    return x
