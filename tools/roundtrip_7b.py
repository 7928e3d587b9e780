"""7B-scale checkpoint roundtrip on the real chip (round-2 verdict item 6).

Real Valley weights are unreachable (zero-egress environment), so this is
the strongest available substitute: build a full-size Valley-7B HF
checkpoint on disk (random, bf16-representable fp32), then prove

    load_valley_checkpoint -> Engine decode on chip
    -> export_valley_checkpoint -> byte-identical weights
    -> reference ValleyLlamaForCausalLM loads it and matches our logits

at the real 7B scale, not tiny shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roundtrip_7b.py
Writes ~60 GB under /tmp/valley7b_* (cleaned at the end).
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time
import types

import ml_dtypes
import numpy as np

SRC = "/tmp/valley7b_src"
EXP = "/tmp/valley7b_export"
TOWER = "/tmp/valley7b_tower"

H, F, L, V, NH = 4096, 11008, 32, 32000, 32
VH, VF, VL, VP, VIMG = 1024, 4096, 24, 14, 224


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bf16_repr(x):
    """Round fp32 to the nearest bf16 so the bf16 serving cast is lossless."""
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def build_src_checkpoint():
    rng = np.random.default_rng(7)
    os.makedirs(SRC, exist_ok=True)

    def w(*shape, std=0.02):
        return bf16_repr((rng.standard_normal(shape, np.float32) * std))

    sd = {}
    sd["model.embed_tokens.weight"] = w(V, H)
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = w(H, H)
        sd[p + "self_attn.k_proj.weight"] = w(H, H)
        sd[p + "self_attn.v_proj.weight"] = w(H, H)
        sd[p + "self_attn.o_proj.weight"] = w(H, H)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "mlp.gate_proj.weight"] = w(F, H)
        sd[p + "mlp.up_proj.weight"] = w(F, H)
        sd[p + "mlp.down_proj.weight"] = w(H, F, std=0.02 / L)
    sd["model.norm.weight"] = np.ones(H, np.float32)
    sd["lm_head.weight"] = w(V, H)
    # ViT-L/14 tower embedded the Valley way (model.vision_tower.*)
    t = "model.vision_tower.vision_model."
    sd[t + "embeddings.class_embedding"] = w(VH)
    sd[t + "embeddings.patch_embedding.weight"] = w(VH, 3, VP, VP)
    n_pos = (VIMG // VP) ** 2 + 1
    sd[t + "embeddings.position_embedding.weight"] = w(n_pos, VH)
    sd[t + "pre_layrnorm.weight"] = np.ones(VH, np.float32)
    sd[t + "pre_layrnorm.bias"] = np.zeros(VH, np.float32)
    for i in range(VL):
        p = t + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[p + ln + ".weight"] = np.ones(VH, np.float32)
            sd[p + ln + ".bias"] = np.zeros(VH, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{proj}.weight"] = w(VH, VH)
            sd[p + f"self_attn.{proj}.bias"] = np.zeros(VH, np.float32)
        sd[p + "mlp.fc1.weight"] = w(VF, VH)
        sd[p + "mlp.fc1.bias"] = np.zeros(VF, np.float32)
        sd[p + "mlp.fc2.weight"] = w(VH, VF, std=0.02 / VL)
        sd[p + "mlp.fc2.bias"] = np.zeros(VH, np.float32)
    sd[t + "post_layernorm.weight"] = np.ones(VH, np.float32)
    sd[t + "post_layernorm.bias"] = np.zeros(VH, np.float32)
    sd["model.mm_projector.weight"] = w(H, VH)
    sd["model.mm_projector.bias"] = np.zeros(H, np.float32)

    log(f"state dict built: {sum(x.nbytes for x in sd.values())/1e9:.1f} GB")
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(SRC, "model.safetensors"))
    log("safetensors written")

    with open(os.path.join(SRC, "config.json"), "w") as f:
        json.dump({
            "architectures": ["ValleyLlamaForCausalLM"],
            "vocab_size": V, "hidden_size": H, "intermediate_size": F,
            "num_hidden_layers": L, "num_attention_heads": NH,
            "max_position_embeddings": 2048, "rms_norm_eps": 1e-6,
            "mm_vision_select_layer": -2, "use_mm_proj": True,
            "mm_hidden_size": VH, "mm_vision_tower": TOWER,
        }, f)

    # word-level 32000-token tokenizer
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, V):
        vocab[f"w{i}"] = i
    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = Whitespace()
    tk.save(os.path.join(SRC, "tokenizer.json"))
    with open(os.path.join(SRC, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "unk_token": "<unk>", "bos_token": "<s>",
                   "eos_token": "</s>", "model_max_length": 2048}, f)
    del sd
    gc.collect()


def compare_dirs():
    """Byte-compare source vs exported weights (lazy, one key at a time)."""
    from safetensors import safe_open

    mismatches = []
    checked = 0
    with safe_open(os.path.join(SRC, "model.safetensors"), "np") as fa, \
            safe_open(os.path.join(EXP, "model.safetensors"), "np") as fb:
        keys_b = set(fb.keys())
        for k in fa.keys():
            if k not in keys_b:
                mismatches.append(f"missing {k}")
                continue
            a = fa.get_tensor(k)
            b = fb.get_tensor(k)
            if k in ("model.embed_tokens.weight", "lm_head.weight"):
                b = b[:V]          # loader grows vocab for special tokens
            if a.shape != b.shape:
                mismatches.append(f"shape {k}: {a.shape} vs {b.shape}")
            elif not np.array_equal(a, b):
                mismatches.append(
                    f"values {k}: maxdiff {np.abs(a - b).max()}")
            checked += 1
    return checked, mismatches


def main():
    t0 = time.time()
    marker = os.path.join(SRC, "tokenizer_config.json")
    if os.path.exists(marker) and os.path.exists(
            os.path.join(SRC, "model.safetensors")):
        log("source checkpoint already on disk; skipping rebuild")
    else:
        log("building 7B source checkpoint...")
        build_src_checkpoint()

    import jax
    import jax.numpy as jnp

    from valley_tpu.inference import Engine, GenerationConfig
    from valley_tpu.models import valley as valley_mod
    from valley_tpu.utils import hf_bridge

    log("loading via load_valley_checkpoint (bf16, real chip)...")
    cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(SRC)
    log(f"loaded: vocab {cfg.text.vocab_size}, "
        f"tap {cfg.vision.select_layer}, pooling {cfg.patch_pooling_method}")

    tok = cfg.tokens
    frames = 8
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * frames + \
        [tok.vi_end]
    rng = np.random.default_rng(0)
    prompt = [1] + span + rng.integers(5, 30000, size=64).tolist()
    images = rng.standard_normal(
        (1, frames, 3, VIMG, VIMG)).astype(np.float32)

    engine = Engine(cfg, params, buckets=(512,), max_new_tokens=32,
                    steps_per_call=32)
    gen = GenerationConfig(max_new_tokens=16, do_sample=False)
    t1 = time.time()
    toks = [int(t[0]) for t in engine.generate_tokens(
        [prompt], images, gen, eos_ids=[-1])]
    log(f"engine video decode (incl. compile): {len(toks)} tokens "
        f"{toks[:8]}... in {time.time()-t1:.1f}s")
    t1 = time.time()
    toks2 = [int(t[0]) for t in engine.generate_tokens(
        [prompt], images, gen, eos_ids=[-1])]
    dt = time.time() - t1
    assert toks2 == toks
    log(f"warm repeat: {len(toks2)/dt:.1f} tok/s end-to-end "
        f"(16 tokens, 32-step chunk)")

    # text-only logits for the reference comparison
    text_ids = np.asarray([[1] + rng.integers(5, 30000, size=15).tolist()])
    ours_logits = np.asarray(valley_mod.forward(
        params, cfg, jnp.asarray(text_ids)))[0, -1]
    log("exporting via export_valley_checkpoint...")
    hf_bridge.export_valley_checkpoint(cfg, params, EXP, tokenizer_src=SRC)
    del params, engine
    gc.collect()

    checked, mismatches = compare_dirs()
    log(f"byte-compare: {checked} tensors checked, "
        f"{len(mismatches)} mismatches")
    for m in mismatches[:10]:
        log("  " + m)
    assert not mismatches, "roundtrip not byte-identical"

    log("loading export with the REFERENCE ValleyLlamaForCausalLM...")
    import torch

    def _stub(name, **attrs):
        import importlib.machinery

        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k2, v2 in attrs.items():
            setattr(mod, k2, v2)
        sys.modules.setdefault(name, mod)

    _stub("decord", VideoReader=None, cpu=None,
          bridge=types.SimpleNamespace(set_bridge=lambda *_: None))
    _stub("torchvision", transforms=types.SimpleNamespace(
        Compose=lambda *a, **k: None))
    _stub("torchvision.transforms", Compose=lambda *a, **k: None)
    _stub("cv2")
    _stub("skimage", transform=None)
    _stub("skimage.transform", resize=None, rotate=None)
    sys.path.insert(0, "/root/reference")
    from safetensors.torch import load_file
    from valley.model.valley_model import (ValleyConfig,
                                           ValleyLlamaForCausalLM)
    import transformers

    ref_cfg = ValleyConfig(
        vocab_size=cfg.text.vocab_size, hidden_size=H,
        intermediate_size=F, num_hidden_layers=L, num_attention_heads=NH,
        max_position_embeddings=2048, rms_norm_eps=1e-6,
        attn_implementation="eager")
    with torch.device("meta"):
        model = ValleyLlamaForCausalLM(ref_cfg)
    model = model.to_empty(device="cpu").eval()
    inner = model.get_model()
    vis_cfg = transformers.CLIPVisionConfig(
        hidden_size=VH, intermediate_size=VF, num_hidden_layers=VL,
        num_attention_heads=16, image_size=VIMG, patch_size=VP,
        attn_implementation="eager")
    inner.vision_tower = transformers.CLIPVisionModel(vis_cfg)
    inner.mm_projector = torch.nn.Linear(VH, H)
    sd = load_file(os.path.join(EXP, "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    blockers = [k for k in missing if "rotary_emb" not in k]
    assert not blockers, blockers[:5]
    assert not unexpected, unexpected[:5]
    del sd
    gc.collect()
    log("reference model loaded; running text-only forward...")
    with torch.no_grad():
        ref_logits = model(
            input_ids=torch.from_numpy(text_ids)).logits[0, -1].numpy()
    diff = np.abs(ours_logits - ref_logits)
    top_ours = int(np.argmax(ours_logits))
    top_ref = int(np.argmax(ref_logits))
    log(f"7B logit diff (ours bf16 on chip vs reference fp32 torch): "
        f"max {diff.max():.4f}, mean {diff.mean():.5f}; "
        f"argmax {top_ours} vs {top_ref} "
        f"({'MATCH' if top_ours == top_ref else 'MISMATCH'})")
    assert top_ours == top_ref

    for d in (SRC, EXP):
        shutil.rmtree(d, ignore_errors=True)
    log(f"ROUNDTRIP OK in {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
