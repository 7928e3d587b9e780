"""Measure the reference Valley's CPU video->answer throughput — the
denominator of BASELINE.json's ">=10x CPU-baseline" north star.

Runs the ACTUAL /root/reference ``ValleyLlamaForCausalLM.completion()``
(valley/model/valley_model.py:424-439) on host CPU at full Valley-7B
dims with random weights (real weights unreachable: zero egress;
throughput is weight-value independent at fixed generation length).

Deviations from the reference path, each the minimum the environment
forces and each FAVORABLE to the reference baseline:

- decord/torchvision are absent from this image, so ``load_video`` is
  monkeypatched to emit the (3, T, 224, 224) CLIP-normalized tensor it
  would return (valley/util/data_util.py:249-281) — i.e. host frame
  decode is FREE for the baseline (our chip numbers pay it, or measure
  it separately in e2e_serve_7b.py).
- The reference hardcodes ``.half()`` (fp16) for images; on this host
  fp16 matmul runs at 53 GFLOP/s vs bf16's 309 (AMX) and fp32's 65
  (measured, 4096^2 matmul, 1 thread), so the cast is mapped to the
  CPU's fastest dtype (bf16 by default; --dtype picks) via a
  torch.Tensor subclass — completion() itself runs byte-unmodified.
- The tokenizer is a local word-level stand-in (zero egress; the 6
  multimodal marker tokens are registered as added special tokens so
  the splice path executes exactly). Token counts are controlled by
  construction, so tok/s is unaffected.

Outputs one JSON line with video->first-token, decode tok/s, and
video->answer wall time at --new-tokens, plus host metadata
(cpu count, dtype) so the published ratio can be audited.

Usage: python tools/cpu_baseline.py [--new-tokens 32] [--dtype bf16]
       [--layers 32]   (small --layers for a quick smoke run)
"""

import argparse
import importlib.machinery
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # tool never touches jax/TPU

import numpy as np
import torch

REF = "/root/reference"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def import_reference():
    _stub("decord", VideoReader=None, cpu=None,
          bridge=types.SimpleNamespace(set_bridge=lambda *_: None))
    _stub("torchvision", transforms=types.SimpleNamespace(
        Compose=lambda *a, **k: None, Resize=None, CenterCrop=None))
    _stub("torchvision.transforms", Compose=lambda *a, **k: None,
          Resize=None, CenterCrop=None)
    _stub("cv2")
    _stub("skimage", transform=types.SimpleNamespace(resize=None,
                                                     rotate=None))
    _stub("skimage.transform", resize=None, rotate=None)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from valley.model import valley_model
    return valley_model


SPECIALS = ["<im_patch>", "<im_start>", "<im_end>",
            "<vi_frame>", "<vi_start>", "<vi_end>"]


def build_tokenizer(base_vocab=32000):
    """Word-level HF fast tokenizer with the 6 multimodal markers as
    added special tokens (ids base_vocab..base_vocab+5), mirroring the
    reference's initialize_vision_tokenizer vocab growth."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, base_vocab):
        vocab[f"w{i}"] = i
    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = Whitespace()
    tok = PreTrainedTokenizerFast(tokenizer_object=tk, unk_token="<unk>",
                                  bos_token="<s>", eos_token="</s>",
                                  pad_token="</s>")
    added = tok.add_tokens(SPECIALS, special_tokens=True)
    assert added == len(SPECIALS)
    return tok


def build_model(valley_model, layers, dtype):
    """Full Valley-7B: 32-layer LLaMA + CLIP ViT-L/14 tower + linear
    mm_projector, wired the way initialize_vision_modules does
    (valley_model.py:59-103) minus the hub download."""
    import transformers

    t0 = time.time()
    cfg = valley_model.ValleyConfig(
        vocab_size=32006, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=layers, num_attention_heads=32,
        max_position_embeddings=2048, rms_norm_eps=1e-6,
        attn_implementation="eager")
    model = valley_model.ValleyLlamaForCausalLM(cfg).eval()
    log(f"LLaMA built in {time.time()-t0:.0f}s")

    vis_cfg = transformers.CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14,
        attn_implementation="eager")
    tower = transformers.CLIPVisionModel(vis_cfg).eval()
    inner = model.get_model()
    inner.vision_tower = tower
    inner.mm_projector = torch.nn.Linear(1024, 4096)
    model.config.mm_vision_select_layer = -2
    model.config.use_mm_proj = True
    model.config.mm_hidden_size = 1024
    # marker ids live on the tower config (valley_model.py:363-365)
    tower.config.im_patch_token = 32000
    tower.config.im_start_token = 32001
    tower.config.im_end_token = 32002
    tower.config.vi_frame_token = 32003
    tower.config.vi_start_token = 32004
    tower.config.vi_end_token = 32005
    model = model.to(dtype)
    log(f"model ready ({dtype}) in {time.time()-t0:.0f}s total")
    return model


class _AsBest(torch.Tensor):
    """completion() hardcodes images.half(); route the cast to the
    host's fastest dtype instead (see module docstring)."""

    _target = torch.bfloat16

    def half(self):
        return self.to(type(self)._target)


def fake_load_video(_path):
    """Shape/dtype twin of valley/util/data_util.py:249-281's return:
    (3, 8, 224, 224) CLIP-normalized float tensor."""
    rng = np.random.default_rng(0)
    v = rng.standard_normal((3, 8, 224, 224)).astype(np.float32)
    return torch.from_numpy(v).as_subclass(_AsBest)


MESSAGES = [
    {"role": "system",
     "content": "You are Valley, a large language and vision assistant "
                "trained by ByteDance. You are able to understand the "
                "visual content that the user provides."},
    {"role": "user", "content": "<video> Describe the video in detail."},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "fp32", "fp16"])
    args = ap.parse_args()
    dtype = {"bf16": torch.bfloat16, "fp32": torch.float32,
             "fp16": torch.float16}[args.dtype]
    _AsBest._target = dtype

    torch.set_num_threads(os.cpu_count())
    torch.manual_seed(0)

    valley_model = import_reference()
    valley_model.load_video = fake_load_video

    tok = build_tokenizer()
    model = build_model(valley_model, args.layers, dtype)

    # 1) the reference path end-to-end, unmodified: completion()
    t0 = time.time()
    with torch.inference_mode():
        resp = model.completion(
            tok, "dummy.mp4", MESSAGES,
            {"max_new_tokens": args.new_tokens, "do_sample": False},
            "cpu")
    wall_answer = time.time() - t0
    log(f"completion() ran: {wall_answer:.1f}s, reply {resp[0][:60]!r}")

    # 2) precise first-token / decode split on the identical generate()
    #    call (completion minus response postprocess), exact token counts
    #    forced via min_new_tokens so a random-weight eos can't shorten
    #    the measured run.
    inputs = model.build_inputs(tok, MESSAGES)
    input_ids = torch.as_tensor(inputs.input_ids)
    images = fake_load_video(None).permute(1, 0, 2, 3)
    images = images.unsqueeze(0).half()
    prompt_len = int(input_ids.shape[1])
    with torch.inference_mode():
        t0 = time.time()
        model.generate(input_ids=input_ids, images=images,
                       max_new_tokens=1, min_new_tokens=1,
                       do_sample=False)
        t_first = time.time() - t0
        log(f"first token: {t_first:.1f}s (prompt {prompt_len} tokens)")
        n = args.new_tokens + 1
        t0 = time.time()
        out = model.generate(input_ids=input_ids, images=images,
                             max_new_tokens=n, min_new_tokens=n,
                             do_sample=False)
        t_n = time.time() - t0
    gen = int(out.shape[1]) - prompt_len
    assert gen == n, (gen, n)
    decode_tps = args.new_tokens / (t_n - t_first)
    result = {
        "metric": "reference Valley-7B CPU video->answer baseline",
        "host_cpus": os.cpu_count(),
        "torch": torch.__version__,
        "dtype": args.dtype,
        "layers": args.layers,
        "prompt_tokens": prompt_len,
        "new_tokens": args.new_tokens,
        "video_to_first_token_s": round(t_first, 2),
        "decode_tok_per_s": round(decode_tps, 3),
        "video_to_answer_s": round(t_n, 2),
        "answer_tok_per_s": round((args.new_tokens + 1) / t_n, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
