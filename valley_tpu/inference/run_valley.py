"""Offline one-shot video Q&A (parity with `valley/inference/run_valley.py`:
openai-style messages, optional LoRA merge, `completion()`).

python -m valley_tpu.inference.run_valley --model-name <ckpt dir> \
    --video-file v.mp4 --query "Describe the video."
"""

from __future__ import annotations

import argparse
import logging


def load_model(model_name: str, vision_tower: str | None = None,
               lora_path: str | None = None, buckets=(512, 1024, 2048),
               max_new_tokens: int = 1024):
    """Build (engine, tokenizer).  With a LoRA adapter dir the factors are
    merged into the base weights (`run_valley.py:26-37` merge_and_unload
    parity)."""
    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.inference.engine import Engine
    from valley_tpu.models import valley

    if model_name == "random:tiny":
        from valley_tpu.tokenizer import ByteFallbackTokenizer

        tokenizer = ByteFallbackTokenizer()
        cfg = C.valley_tiny().replace(tokens=tokenizer.special_tokens())
        params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    else:
        from valley_tpu.utils import hf_bridge

        cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(
            model_name, vision_tower=vision_tower)
        if lora_path:
            from valley_tpu.train import lora as lora_lib
            from valley_tpu.utils import checkpoint as ckpt_lib

            adapter = ckpt_lib.restore_pytree(lora_path)
            params = lora_lib.merge_lora(lora_lib.load_lora(params, adapter))
    engine = Engine(cfg, params, buckets=buckets,
                    max_new_tokens=max_new_tokens)
    return engine, tokenizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-name", type=str, required=True)
    parser.add_argument("--video-file", type=str, required=True)
    parser.add_argument("--query", type=str,
                        default="Describe the video concisely.")
    parser.add_argument("--system-prompt", type=str, default=(
        "You are Valley, a large language and vision assistant trained by "
        "ByteDance. You are able to understand the visual content or video "
        "that the user provides, and assist the user with a variety of "
        "tasks using natural language. Follow the instructions carefully "
        "and explain your answers in detail."))
    parser.add_argument("--vision-tower", type=str, default=None)
    parser.add_argument("--lora-path", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--num-frames", type=int, default=8)
    parser.add_argument("--do-sample", action="store_true")
    parser.add_argument("--speculative", action="store_true",
                        help="n-gram self-speculative decode (greedy "
                             "token-identical, sampling "
                             "distribution-exact)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from valley_tpu.inference.engine import GenerationConfig
    from valley_tpu.inference.generate import completion

    engine, tokenizer = load_model(args.model_name, args.vision_tower,
                                   args.lora_path,
                                   max_new_tokens=args.max_new_tokens)
    messages = [
        {"role": "system", "content": args.system_prompt},
        {"role": "user", "content": args.query + " <video>"},
    ]
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           temperature=args.temperature,
                           do_sample=args.do_sample)
    response = completion(engine, tokenizer, args.video_file, messages,
                          gen, speculative=args.speculative)
    print(response[0])


if __name__ == "__main__":
    main()
