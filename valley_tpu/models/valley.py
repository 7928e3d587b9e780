"""The Valley multimodal model: CLIP tower + projector + temporal
aggregation + LLaMA decoder, as one functional JAX graph.

Key TPU-first departure from the reference (`valley/model/valley_model.py`):
the per-sample python splice loop (`:195-247`, `torch.cat` per span) becomes
a **vectorized gather/select** — Valley's multimodal layout is statically
sized (P patch tokens between <im_start>/<im_end>, T frame tokens between
<vi_start>/<vi_end>), so for every position we compute which pooled/frame
vector it should hold and blend with `jnp.where`.  No dynamic shapes, fully
jittable, multi-span semantics preserved (every span of a sample receives
the same pooled features, exactly as the reference's loop at `:224-242`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from valley_tpu.config import ValleyConfig
from valley_tpu.constants import IGNORE_INDEX
from valley_tpu.models import clip_vit, llama, temporal


class VisionFeatures(NamedTuple):
    pooled: jnp.ndarray     # (B, P, H)  temporally pooled patch features
    frame_cls: jnp.ndarray  # (B, T, H)  per-frame CLS features


def init_params(cfg: ValleyConfig, key: jax.Array, dtype=jnp.bfloat16,
                fused: bool = False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hv, hl = cfg.vision.hidden_size, cfg.text.hidden_size
    proj_w = (jax.random.normal(k3, (hv, hl), jnp.float32)
              * hv ** -0.5).astype(dtype)
    return {
        "llama": llama.init_params(cfg.text, k1, dtype, fused=fused),
        "vision": clip_vit.init_params(cfg.vision, k2, dtype),
        # Single linear mm_projector (`valley_model.py:55`).
        "projector": {"w": proj_w, "b": jnp.zeros((hl,), dtype)},
        "temporal": temporal.init_params(cfg, k4, dtype),
    }


def encode_images(params, cfg: ValleyConfig, images: jnp.ndarray,
                  stop_vision_gradient: bool = True,
                  frame_mask: Optional[jnp.ndarray] = None) -> VisionFeatures:
    """images: (B, T, 3, H, W) CLIP-normalized frames -> vision features.

    ``uint8`` images are accepted as RAW resized/cropped pixels and
    CLIP-normalized here, on device, in fp32 (bit-identical to the host
    `transforms.Normalize` + bf16 cast): the serving host->device tunnel
    moves ~16 MB/s (tools/exp_first_token.py), so shipping 1 byte/pixel
    instead of 2 halves the dominant video first-token cost.

    The tower is frozen in every reference recipe
    (`valley_model.py:69`, `requires_grad_(False)`), so its activations are
    wrapped in `stop_gradient`; the projector and temporal module remain
    differentiable.  ``frame_mask``: optional (B, T) bool for batches whose
    samples have different frame counts (padding at the END of the axis).
    """
    if images.dtype == jnp.uint8:
        mean = jnp.asarray(clip_vit.CLIP_MEAN,
                           jnp.float32).reshape(1, 1, 3, 1, 1)
        std = jnp.asarray(clip_vit.CLIP_STD,
                          jnp.float32).reshape(1, 1, 3, 1, 1)
        images = ((images.astype(jnp.float32) / 255.0 - mean)
                  / std).astype(jnp.bfloat16)
    b, t = images.shape[:2]
    flat = images.reshape((b * t,) + images.shape[2:])
    feats = clip_vit.encode(params["vision"], cfg.vision, flat)  # (B*T,1+P,Hv)
    if stop_vision_gradient:
        feats = jax.lax.stop_gradient(feats)
    feats = feats @ params["projector"]["w"] + params["projector"]["b"]
    feats = feats.reshape(b, t, feats.shape[1], feats.shape[2])

    patch = feats[:, :, 1:, :]     # (B, T, P, H)
    cls = feats[:, :, 0, :]        # (B, T, H)
    if frame_mask is None:
        pooled = jax.vmap(lambda pf: temporal.pool_patches(
            params["temporal"], cfg, pf))(patch)
    else:
        pooled = jax.vmap(lambda pf, fm: temporal.pool_patches(
            params["temporal"], cfg, pf, fm))(patch, frame_mask)
    return VisionFeatures(pooled=pooled, frame_cls=cls)


def splice_embeddings(cfg: ValleyConfig, input_ids: jnp.ndarray,
                      embeds: jnp.ndarray,
                      feats: VisionFeatures) -> jnp.ndarray:
    """Insert vision features at their marker-token positions.

    For each position holding <im_patch> number i (counting from the start
    of the sequence, mod P) the embedding becomes ``pooled[i]``; likewise
    <vi_frame> number j (mod T) becomes ``frame_cls[j]``.  Text-only rows
    pass through unchanged — the reference's dummy-feature gradient trick
    (`valley_model.py:192-200`) is unnecessary under functional autodiff.
    """
    tok = cfg.tokens
    p = feats.pooled.shape[1]
    t = feats.frame_cls.shape[1]

    is_patch = input_ids == tok.im_patch
    is_frame = input_ids == tok.vi_frame
    patch_idx = (jnp.cumsum(is_patch, axis=1) - 1).clip(0) % p
    frame_idx = (jnp.cumsum(is_frame, axis=1) - 1).clip(0) % t

    pooled_g = jnp.take_along_axis(feats.pooled, patch_idx[..., None], axis=1)
    frame_g = jnp.take_along_axis(feats.frame_cls, frame_idx[..., None],
                                  axis=1)
    pooled_g = pooled_g.astype(embeds.dtype)
    frame_g = frame_g.astype(embeds.dtype)
    out = jnp.where(is_patch[..., None], pooled_g, embeds)
    out = jnp.where(is_frame[..., None], frame_g, out)
    return out


def build_inputs_embeds(params, cfg: ValleyConfig, input_ids: jnp.ndarray,
                        images: Optional[jnp.ndarray],
                        stop_vision_gradient: bool = True,
                        frame_mask: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    embeds = llama.embed(params["llama"], input_ids)
    if images is not None:
        feats = encode_images(params, cfg, images, stop_vision_gradient,
                              frame_mask)
        embeds = splice_embeddings(cfg, input_ids, embeds, feats)
    return embeds


def forward(params, cfg: ValleyConfig, input_ids: jnp.ndarray,
            images: Optional[jnp.ndarray] = None,
            attn_mask: Optional[jnp.ndarray] = None,
            remat: bool = False,
            use_flash: Optional[bool] = None,
            frame_mask: Optional[jnp.ndarray] = None,
            lora_rng=None, lora_dropout: float = 0.0) -> jnp.ndarray:
    """Full forward to fp32 logits (B, S, V) — the jittable equivalent of
    `ValleyLlamaForCausalLM.forward` (`valley_model.py:272-305`)."""
    embeds = build_inputs_embeds(params, cfg, input_ids, images,
                                 frame_mask=frame_mask)
    return llama.forward(params["llama"], cfg.text, embeds, attn_mask,
                         remat=remat, use_flash=use_flash,
                         lora_rng=lora_rng, lora_dropout=lora_dropout)


def shifted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray
                          ) -> jnp.ndarray:
    """Mean CE over non-ignored shifted targets — parity with the
    reference's shifted `CrossEntropyLoss(ignore_index=-100)`
    (`valley_model.py:308-318`)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def loss_fn(params, cfg: ValleyConfig, batch, remat: bool = True,
            use_flash: Optional[bool] = None,
            lora_rng=None, lora_dropout: float = 0.0) -> jnp.ndarray:
    logits = forward(params, cfg, batch["input_ids"],
                     batch.get("images"), batch.get("attention_mask"),
                     remat=remat, use_flash=use_flash,
                     frame_mask=batch.get("frame_mask"),
                     lora_rng=lora_rng, lora_dropout=lora_dropout)
    return shifted_cross_entropy(logits, batch["labels"])
