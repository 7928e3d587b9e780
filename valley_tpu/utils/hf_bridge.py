"""HF checkpoint bridge: PyTorch Valley/LLaMA/CLIP weights -> JAX pytrees.

Converts the reference's checkpoint formats into this framework's stacked
-layer param trees with 1e-3-grade logit fidelity:

* LLaMA/Vicuna decoder (`LlamaForCausalLM` state dict; HF stores Linear
  weights (out, in) — transposed here; the rotate-half RoPE layout matches,
  no head permutation needed);
* CLIP ViT-L/14 tower (`CLIPVisionModel`; the stride-14 patch conv weight
  (H, 3, p, p) flattens to our (3*p*p, H) matmul in the identical
  in/kh/kw order);
* Valley extras: `mm_projector` (`valley_model.py:55`), the v2 pooling
  linear (`:42`) and the v3 `nn.TransformerEncoderLayer` (in_proj split
  into q/k/v, `:47-51`), plus the sinusoidal position matrix.

Also exposes the reverse (JAX -> HF state dict) for interop, and
`load_valley_checkpoint` reading safetensors/bin shards from a directory.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C


def _np(t) -> np.ndarray:
    """torch tensor / array -> numpy fp32 (bf16-safe)."""
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def _host_f32(x) -> np.ndarray:
    """Device array -> host fp32: transfer in the storage dtype (bf16),
    cast on the host.  Casting on-device first would allocate a full fp32
    copy in HBM — at 7B scale that OOMs a 16 GB chip mid-export."""
    return np.asarray(np.asarray(x), np.float32)


def _dense(sd, key, dtype):
    """HF Linear weight (out, in) -> (in, out)."""
    return jnp.asarray(_np(sd[key]).T, dtype)


def _vec(sd, key, dtype):
    return jnp.asarray(_np(sd[key]), dtype)


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out or sd


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------

def convert_llama(sd: Dict[str, Any], cfg: C.TextConfig,
                  dtype=jnp.bfloat16, device: bool = True
                  ) -> Dict[str, Any]:
    """HF `LlamaForCausalLM` state dict (keys `model.layers.N...`,
    `lm_head.weight`) -> our stacked pytree.

    ``device=False`` keeps every tensor on the HOST (numpy; bf16 via
    ml_dtypes) — the quantize-on-load path for models whose bf16 tree
    exceeds chip HBM (13B: ~26 GB vs 16 GB; see
    `load_valley_checkpoint(quantize=...)`)."""
    put = jnp.asarray if device else np.asarray
    sd = {k.replace("base_model.model.", ""): v for k, v in sd.items()}
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        mats = []
        for i in range(L):
            w = _np(sd[fmt.format(i)])
            mats.append(w.T if transpose else w)
        return put(np.stack(mats), dtype)

    # layer projections keep the torch nn.Linear (out, in) layout verbatim
    # (see llama.init_params)
    layers = {
        "attn_norm": stack("model.layers.{}.input_layernorm.weight",
                           transpose=False),
        "wq": stack("model.layers.{}.self_attn.q_proj.weight",
                    transpose=False),
        "wk": stack("model.layers.{}.self_attn.k_proj.weight",
                    transpose=False),
        "wv": stack("model.layers.{}.self_attn.v_proj.weight",
                    transpose=False),
        "wo": stack("model.layers.{}.self_attn.o_proj.weight",
                    transpose=False),
        "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight",
                          transpose=False),
        "w_gate": stack("model.layers.{}.mlp.gate_proj.weight",
                        transpose=False),
        "w_up": stack("model.layers.{}.mlp.up_proj.weight",
                      transpose=False),
        "w_down": stack("model.layers.{}.mlp.down_proj.weight",
                        transpose=False),
    }
    return {
        "embed": put(_np(sd["model.embed_tokens.weight"]), dtype),
        "layers": layers,
        "final_norm": put(_np(sd["model.norm.weight"]), dtype),
        "lm_head": put(_np(sd["lm_head.weight"]).T, dtype),
    }


def export_llama(params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Our pytree -> HF-layout numpy state dict (for delta tools etc.)."""
    out = {}
    lay = params["layers"]
    L = lay["wq"].shape[0]
    name_map = {
        "attn_norm": ("input_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", False),
        "wk": ("self_attn.k_proj.weight", False),
        "wv": ("self_attn.v_proj.weight", False),
        "wo": ("self_attn.o_proj.weight", False),
        "mlp_norm": ("post_attention_layernorm.weight", False),
        "w_gate": ("mlp.gate_proj.weight", False),
        "w_up": ("mlp.up_proj.weight", False),
        "w_down": ("mlp.down_proj.weight", False),
    }
    for ours, (theirs, transpose) in name_map.items():
        arr = _host_f32(lay[ours])
        for i in range(L):
            w = arr[i].T if transpose else arr[i]
            out[f"{prefix}model.layers.{i}.{theirs}"] = w
    out[prefix + "model.embed_tokens.weight"] = _host_f32(params["embed"])
    out[prefix + "model.norm.weight"] = _host_f32(params["final_norm"])
    out[prefix + "lm_head.weight"] = _host_f32(params["lm_head"]).T
    return out


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------

def convert_clip(sd: Dict[str, Any], cfg: C.VisionConfig,
                 dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF `CLIPVisionModel` OR `ChineseCLIPVisionModel` state dict -> our
    pytree.  Accepts keys with or without the `vision_model.` prefix.

    The reference auto-selects ChineseCLIP when the tower path contains
    "chinese" (`valley_model.py:32-36`); architecturally the HF
    ChineseCLIP vision transformer IS the CLIP one (same embeddings,
    q/k/v/out_proj, quick-GELU MLP, identical preprocessing constants) —
    the only state-dict delta is the correctly spelled `pre_layernorm`
    (CLIP ships the historical `pre_layrnorm` typo), normalized here."""
    sd = _strip_prefix(sd, "vision_model.")
    if "pre_layernorm.weight" in sd:     # ChineseCLIP spelling
        sd = dict(sd)
        sd["pre_layrnorm.weight"] = sd["pre_layernorm.weight"]
        sd["pre_layrnorm.bias"] = sd["pre_layernorm.bias"]
    L = cfg.num_hidden_layers
    h = cfg.hidden_size

    conv = _np(sd["embeddings.patch_embedding.weight"])  # (H, 3, p, p)
    patch = jnp.asarray(conv.reshape(h, -1).T, dtype)    # (3*p*p, H)

    def stack(fmt, transpose=True):
        mats = []
        for i in range(L):
            w = _np(sd[fmt.format(i)])
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype)

    enc = "encoder.layers.{}."
    layers = {
        "ln1_scale": stack(enc + "layer_norm1.weight", False),
        "ln1_bias": stack(enc + "layer_norm1.bias", False),
        "wq": stack(enc + "self_attn.q_proj.weight"),
        "bq": stack(enc + "self_attn.q_proj.bias", False),
        "wk": stack(enc + "self_attn.k_proj.weight"),
        "bk": stack(enc + "self_attn.k_proj.bias", False),
        "wv": stack(enc + "self_attn.v_proj.weight"),
        "bv": stack(enc + "self_attn.v_proj.bias", False),
        "wo": stack(enc + "self_attn.out_proj.weight"),
        "bo": stack(enc + "self_attn.out_proj.bias", False),
        "ln2_scale": stack(enc + "layer_norm2.weight", False),
        "ln2_bias": stack(enc + "layer_norm2.bias", False),
        "fc1": stack(enc + "mlp.fc1.weight"),
        "fc1_bias": stack(enc + "mlp.fc1.bias", False),
        "fc2": stack(enc + "mlp.fc2.weight"),
        "fc2_bias": stack(enc + "mlp.fc2.bias", False),
    }
    return {
        "class_embedding": _vec(sd, "embeddings.class_embedding", dtype),
        "patch_embedding": patch,
        "position_embedding": _vec(
            sd, "embeddings.position_embedding.weight", dtype),
        "pre_ln_scale": _vec(sd, "pre_layrnorm.weight", dtype),
        "pre_ln_bias": _vec(sd, "pre_layrnorm.bias", dtype),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Valley extras
# ---------------------------------------------------------------------------

def convert_projector(sd: Dict[str, Any], dtype=jnp.bfloat16,
                      prefix: str = "model.mm_projector."):
    sd2 = _strip_prefix(sd, prefix)
    return {"w": _dense(sd2, "weight", dtype), "b": _vec(sd2, "bias", dtype)}


def convert_temporal(sd: Dict[str, Any], cfg: C.ValleyConfig,
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Pooling-variant weights from a Valley state dict (keys under
    `model.pooling_layer.` / `model.transformer_delta_encoder.`)."""
    method = cfg.patch_pooling_method
    if method in ("mean", "max"):
        return {}
    if method == "temporal_importance":
        return {
            "pooling_w": _dense(sd, "model.pooling_layer.weight", dtype),
            "pooling_b": _vec(sd, "model.pooling_layer.bias", dtype),
        }
    # temporal_transformer: torch TransformerEncoder layer 0
    p = "model.transformer_delta_encoder.layers.0."
    in_w = _np(sd[p + "self_attn.in_proj_weight"])   # (3H, H)
    in_b = _np(sd[p + "self_attn.in_proj_bias"])     # (3H,)
    h = in_w.shape[1]
    wq, wk, wv = in_w[:h], in_w[h:2 * h], in_w[2 * h:]
    bq, bk, bv = in_b[:h], in_b[h:2 * h], in_b[2 * h:]
    pos_key = "model.position_matrix"
    if pos_key in sd:
        pos = jnp.asarray(_np(sd[pos_key]), dtype)
    else:
        from valley_tpu.models.temporal import sinusoidal_position_matrix

        pos = sinusoidal_position_matrix(cfg.temporal_pos_len, h).astype(dtype)
    return {
        "wq": jnp.asarray(wq.T, dtype), "bq": jnp.asarray(bq, dtype),
        "wk": jnp.asarray(wk.T, dtype), "bk": jnp.asarray(bk, dtype),
        "wv": jnp.asarray(wv.T, dtype), "bv": jnp.asarray(bv, dtype),
        "wo": _dense(sd, p + "self_attn.out_proj.weight", dtype),
        "bo": _vec(sd, p + "self_attn.out_proj.bias", dtype),
        "ln1_scale": _vec(sd, p + "norm1.weight", dtype),
        "ln1_bias": _vec(sd, p + "norm1.bias", dtype),
        "ln2_scale": _vec(sd, p + "norm2.weight", dtype),
        "ln2_bias": _vec(sd, p + "norm2.bias", dtype),
        "ffn1": _dense(sd, p + "linear1.weight", dtype),
        "ffn1_bias": _vec(sd, p + "linear1.bias", dtype),
        "ffn2": _dense(sd, p + "linear2.weight", dtype),
        "ffn2_bias": _vec(sd, p + "linear2.bias", dtype),
        "position_matrix": pos,
    }


# ---------------------------------------------------------------------------
# Checkpoint directory loading
# ---------------------------------------------------------------------------

def read_state_dict(path: str) -> Dict[str, Any]:
    """Load all weights from a HF checkpoint dir (safetensors preferred,
    torch .bin shards otherwise)."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        sd = {}
        for f in st_files:
            with safe_open(f, framework="np") as reader:
                for k in reader.keys():
                    sd[k] = reader.get_tensor(k)
        return sd
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no weights found under {path}")
    import torch

    sd = {}
    for f in bin_files:
        sd.update(torch.load(f, map_location="cpu", weights_only=True))
    return sd


def export_clip(params_vision, prefix: str = "") -> Dict[str, np.ndarray]:
    """Our CLIP pytree -> HF `vision_model.*` state dict (fp32 numpy)."""
    out = {}
    p = lambda k: prefix + "vision_model." + k  # noqa: E731

    def f32(x):
        return _host_f32(x)

    lay = params_vision["layers"]
    L = lay["wq"].shape[0]
    h = params_vision["class_embedding"].shape[0]
    patch = f32(params_vision["patch_embedding"])   # (3*ps*ps, H)
    ps = int(round((patch.shape[0] // 3) ** 0.5))
    out[p("embeddings.class_embedding")] = f32(
        params_vision["class_embedding"])
    out[p("embeddings.patch_embedding.weight")] = \
        patch.T.reshape(h, 3, ps, ps)
    out[p("embeddings.position_embedding.weight")] = f32(
        params_vision["position_embedding"])
    out[p("pre_layrnorm.weight")] = f32(params_vision["pre_ln_scale"])
    out[p("pre_layrnorm.bias")] = f32(params_vision["pre_ln_bias"])
    name_map = {
        "ln1_scale": ("layer_norm1.weight", False),
        "ln1_bias": ("layer_norm1.bias", False),
        "wq": ("self_attn.q_proj.weight", True),
        "bq": ("self_attn.q_proj.bias", False),
        "wk": ("self_attn.k_proj.weight", True),
        "bk": ("self_attn.k_proj.bias", False),
        "wv": ("self_attn.v_proj.weight", True),
        "bv": ("self_attn.v_proj.bias", False),
        "wo": ("self_attn.out_proj.weight", True),
        "bo": ("self_attn.out_proj.bias", False),
        "ln2_scale": ("layer_norm2.weight", False),
        "ln2_bias": ("layer_norm2.bias", False),
        "fc1": ("mlp.fc1.weight", True),
        "fc1_bias": ("mlp.fc1.bias", False),
        "fc2": ("mlp.fc2.weight", True),
        "fc2_bias": ("mlp.fc2.bias", False),
    }
    for ours, (theirs, transpose) in name_map.items():
        arr = f32(lay[ours])
        for i in range(L):
            w = arr[i].T if transpose else arr[i]
            out[p(f"encoder.layers.{i}.{theirs}")] = w
    # HF checkpoints carry a post_layernorm even though the -2 tap never
    # uses it; emit identity so the reference class loads cleanly
    out[p("post_layernorm.weight")] = np.ones((h,), np.float32)
    out[p("post_layernorm.bias")] = np.zeros((h,), np.float32)
    return out


def export_valley_checkpoint(cfg, params, out_dir: str,
                             tokenizer_src: Optional[str] = None) -> str:
    """Write an HF-layout checkpoint dir loadable by the reference's
    `ValleyLlamaForCausalLM.from_pretrained` (and by our own loader):
    model.safetensors with `model.* / lm_head / model.mm_projector.* /
    model.vision_tower.vision_model.* / model.pooling_layer.* /
    model.transformer_delta_encoder.*` keys plus a `config.json` carrying
    the Valley flags (`valley_model.py:18-19,76-80`)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    sd = export_llama(params["llama"])
    if "projector" in params and params["projector"]:
        sd["model.mm_projector.weight"] = _host_f32(
            params["projector"]["w"]).T
        sd["model.mm_projector.bias"] = _host_f32(params["projector"]["b"])
    if params.get("vision"):
        sd.update(export_clip(params["vision"],
                              prefix="model.vision_tower."))
    tp = params.get("temporal") or {}
    if "pooling_w" in tp:
        sd["model.pooling_layer.weight"] = _host_f32(tp["pooling_w"]).T
        sd["model.pooling_layer.bias"] = _host_f32(tp["pooling_b"])
    if "wq" in tp:  # temporal transformer
        pfx = "model.transformer_delta_encoder.layers.0."
        f32 = _host_f32
        sd[pfx + "self_attn.in_proj_weight"] = np.concatenate(
            [f32(tp["wq"]).T, f32(tp["wk"]).T, f32(tp["wv"]).T], axis=0)
        sd[pfx + "self_attn.in_proj_bias"] = np.concatenate(
            [f32(tp["bq"]), f32(tp["bk"]), f32(tp["bv"])])
        sd[pfx + "self_attn.out_proj.weight"] = f32(tp["wo"]).T
        sd[pfx + "self_attn.out_proj.bias"] = f32(tp["bo"])
        sd[pfx + "norm1.weight"] = f32(tp["ln1_scale"])
        sd[pfx + "norm1.bias"] = f32(tp["ln1_bias"])
        sd[pfx + "norm2.weight"] = f32(tp["ln2_scale"])
        sd[pfx + "norm2.bias"] = f32(tp["ln2_bias"])
        sd[pfx + "linear1.weight"] = f32(tp["ffn1"]).T
        sd[pfx + "linear1.bias"] = f32(tp["ffn1_bias"])
        sd[pfx + "linear2.weight"] = f32(tp["ffn2"]).T
        sd[pfx + "linear2.bias"] = f32(tp["ffn2_bias"])
        sd["model.position_matrix"] = f32(tp["position_matrix"])

    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(out_dir, "model.safetensors"))

    t = cfg.text
    hf_cfg = {
        "architectures": ["ValleyLlamaForCausalLM"],
        "model_type": "valley",
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.kv_heads,
        "max_position_embeddings": t.max_position_embeddings,
        "rms_norm_eps": t.rms_norm_eps,
        "rope_theta": t.rope_theta,
        "use_mm_proj": True,
        "mm_hidden_size": cfg.vision.hidden_size,
        "mm_vision_select_layer": cfg.vision.select_layer,
        "mm_use_im_start_end": True,
        "use_patch_importance_pooling":
            cfg.patch_pooling_method == "temporal_importance",
        "use_delta_transformer":
            cfg.patch_pooling_method == "temporal_transformer",
        "torch_dtype": "float32",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    if tokenizer_src and os.path.isdir(tokenizer_src):
        import shutil

        for fname in ("tokenizer.model", "tokenizer.json",
                      "tokenizer_config.json", "special_tokens_map.json"):
            src = os.path.join(tokenizer_src, fname)
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(out_dir, fname))
    return out_dir


def resize_token_embeddings(llama_params, new_vocab: int,
                            num_new_init: Optional[int] = None):
    """Grow (or shrink) the embedding table and lm_head to ``new_vocab``
    rows, initializing new rows to the mean of the existing ones — parity
    with `initialize_vision_tokenizer` (`valley_model.py:354-379`) and
    `smart_tokenizer_and_embedding_resize` (`data_util.py:86-108`).
    Returns (new_params, new_vocab_size)."""
    embed = llama_params["embed"]
    head = llama_params["lm_head"]          # (H, V)
    old_vocab = embed.shape[0]
    if new_vocab == old_vocab:
        return llama_params, old_vocab
    out = dict(llama_params)
    if new_vocab < old_vocab:
        out["embed"] = embed[:new_vocab]
        out["lm_head"] = head[:, :new_vocab]
        return out, new_vocab
    num_new = new_vocab - old_vocab
    if num_new_init is None:
        num_new_init = num_new
    e_mean = jnp.mean(embed.astype(jnp.float32), axis=0, keepdims=True)
    h_mean = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
    out["embed"] = jnp.concatenate(
        [embed, jnp.broadcast_to(e_mean, (num_new, embed.shape[1])
                                 ).astype(embed.dtype)], axis=0)
    out["lm_head"] = jnp.concatenate(
        [head, jnp.broadcast_to(h_mean, (head.shape[0], num_new)
                                ).astype(head.dtype)], axis=1)
    return out, new_vocab


def text_config_from_hf(hf_cfg: dict) -> C.TextConfig:
    return C.TextConfig(
        vocab_size=hf_cfg.get("vocab_size", 32000),
        hidden_size=hf_cfg.get("hidden_size", 4096),
        intermediate_size=hf_cfg.get("intermediate_size", 11008),
        num_hidden_layers=hf_cfg.get("num_hidden_layers", 32),
        num_attention_heads=hf_cfg.get("num_attention_heads", 32),
        num_key_value_heads=hf_cfg.get("num_key_value_heads"),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 2048),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
    )


def load_valley_checkpoint(path: str, vision_tower: Optional[str] = None,
                           select_layer: int = -2,
                           pooling: str = "mean",
                           dtype=jnp.bfloat16,
                           model_max_length: int = 2048,
                           quantize: Optional[str] = None,
                           quantize_group_size: int = 128,
                           fused: bool = False):
    """Load a full Valley (or plain LLaMA) HF checkpoint directory.

    Returns (ValleyConfig, params, tokenizer).  The vision tower comes from
    the same state dict when present (Valley checkpoints embed it under
    `model.vision_tower.`), else from ``vision_tower`` (a local CLIP
    checkpoint dir).

    ``quantize`` (any `ops.quant.QUANT_MODES` name — 'int8' | 'int8a8' |
    'int4' | 'int4g' | 'int4gp' | 'int4ga8' | 'int4gpa8') runs
    QUANTIZE-ON-LOAD: the decoder converts / (optionally) fuses /
    quantizes / packs entirely on the HOST and only the final quantized
    tree transfers to device — a 13B bf16 tree (~26 GB) never exists on
    the chip, which is what makes ``--quantize int4gp`` 13B serving
    possible on one 16 GB v5e (host math is bit-identical to the device
    quantizer, tests/test_quant.py).  ``fused`` applies the
    wqkv/w_gateup serving layout before quantization (worker --fused).
    LoRA merging is incompatible with quantize-on-load (adapters need
    the bf16 base): merge first, then load the merged checkpoint.
    """
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    text_cfg = text_config_from_hf(hf_cfg)
    if hf_cfg.get("use_patch_importance_pooling"):
        pooling = "temporal_importance"
    if hf_cfg.get("use_delta_transformer"):
        pooling = "temporal_transformer"

    from valley_tpu.tokenizer import load_hf_tokenizer

    tokenizer, tokens = load_hf_tokenizer(path, model_max_length)

    # the checkpoint records its trained vision tap (the reference reads
    # it from model config at forward time, `valley_model.py`); honor it
    # over the argument default so a -1-tap checkpoint loads correctly
    select_layer = int(hf_cfg.get("mm_vision_select_layer", select_layer))
    vis_cfg = C.VisionConfig(select_layer=select_layer)
    cfg = C.ValleyConfig(text=text_cfg, vision=vis_cfg, tokens=tokens,
                         patch_pooling_method=pooling)

    sd = read_state_dict(path)
    host_quant = quantize is not None
    params: Dict[str, Any] = {
        "llama": convert_llama(sd, text_cfg, dtype,
                               device=not host_quant)}
    # the Valley special tokens may extend the vocab beyond the stored
    # embedding (plain LLaMA base + 6 markers): mean-init the new rows
    tok_vocab = len(tokenizer)
    if tok_vocab != params["llama"]["embed"].shape[0]:
        params["llama"], new_vocab = resize_token_embeddings(
            params["llama"], tok_vocab)
        import dataclasses as _dc

        text_cfg = _dc.replace(text_cfg, vocab_size=new_vocab)
        cfg = cfg.replace(text=text_cfg)
    if host_quant:
        import jax

        from valley_tpu.models.llama import fuse_llama_params
        from valley_tpu.ops.quant import (pack_int4_params_host,
                                          parse_quant_mode,
                                          quantize_llama_params_host)

        # resize may have produced device leaves for embed/lm_head —
        # pull them back; the whole pipeline below stays on host
        params["llama"] = {
            k: (np.asarray(jax.device_get(v)) if k != "layers" else
                {n: np.asarray(jax.device_get(a)) for n, a in v.items()})
            for k, v in params["llama"].items()}
        if fused:
            fuse_llama_params(params)     # host path (no jax.Array leaves)
        qm = parse_quant_mode(quantize)
        quantize_llama_params_host(
            params, bits=qm["bits"],
            group_size=quantize_group_size if qm["group_size"] else 0,
            act8=qm["act8"])
        if qm["packed"]:
            pack_int4_params_host(params)
        # single transfer of the final (quantized) tree, tensor by tensor
        params["llama"] = jax.tree.map(jnp.asarray, params["llama"])

    tower_sd = _strip_prefix(
        {k: v for k, v in sd.items() if "vision_tower." in k},
        "model.vision_tower.")
    if tower_sd:
        params["vision"] = convert_clip(tower_sd, vis_cfg, dtype)
    elif vision_tower and os.path.isdir(vision_tower):
        params["vision"] = convert_clip(read_state_dict(vision_tower),
                                        vis_cfg, dtype)
    else:
        import jax

        params["vision"] = __import__(
            "valley_tpu.models.clip_vit", fromlist=["init_params"]
        ).init_params(vis_cfg, jax.random.key(0), dtype)

    if any("mm_projector" in k for k in sd):
        params["projector"] = convert_projector(sd, dtype)
    else:
        hl, hv = text_cfg.hidden_size, vis_cfg.hidden_size
        params["projector"] = {"w": jnp.zeros((hv, hl), dtype),
                               "b": jnp.zeros((hl,), dtype)}
    params["temporal"] = convert_temporal(sd, cfg, dtype)
    return cfg, params, tokenizer
