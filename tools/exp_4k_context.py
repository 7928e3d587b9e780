"""4096-token context on the real chip (VERDICT r3 item 6 second half):
prefill latency + decode tok/s at the 4096 bucket, Valley-7B int8, and
the HBM accounting that bounds it.

The streaming-K flash kernel was verified at S=4096 in round 2
(ops/flash_attention.py); this measures the ENGINE at a 4096 prompt:

  prefill   — video->first-token at a ~3k-token prompt in the 4096
              bucket (vs ~0.18 s at the 512 bucket)
  decode    — tok/s with the full 4096-token KV resident (KV reads grow
              ~8x vs the 512-bucket bench; weights still dominate)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_4k_context.py [new_tokens]
VALLEY_BENCH_QUANT=int8a8 additionally runs the W8A8 prefill path
(llama._w8a8_dot; long prompts are where prefill compute dominates
first-token latency, so this is the mode's best case).
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.inference import Engine, GenerationConfig
    from valley_tpu.models import valley
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.serve import hbm

    new = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = C.ValleyConfig(text=C.LLAMA2_7B)   # 4096-native rope
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    qmode = os.environ.get("VALLEY_BENCH_QUANT", "int8")
    params = quantize_llama_params(params, act8=qmode == "int8a8")
    print(f"quant mode: {qmode}", flush=True)
    jax.block_until_ready(params)

    eng = Engine(cfg, params, buckets=(512, 4096), max_new_tokens=new,
                 cache_dtype=jnp.int8, steps_per_call=32)
    slot = hbm.kv_slot_bytes(cfg.text, jnp.int8)
    print(f"KV bytes: {slot/1e3:.0f} kB/slot; 4096-bucket request cache "
          f"{(4096+new+32)*slot/1e9:.2f} GB; weights "
          f"{hbm.tree_bytes(params)/1e9:.2f} GB", flush=True)

    gen = GenerationConfig(max_new_tokens=new, do_sample=False)
    rng = np.random.default_rng(0)
    for plen in (400, 3000):
        prompt = rng.integers(5, 31000, size=plen).tolist()
        # warm (compile) then measure twice
        for it in range(3):
            t0 = time.perf_counter()
            toks = []
            t_first = None
            for t in eng.generate_tokens([prompt], gen=gen,
                                         eos_ids=[-1]):
                if t_first is None:
                    t_first = time.perf_counter() - t0
                toks.append(int(t[0]))
            total = time.perf_counter() - t0
            if it == 0:
                print(f"plen {plen}: compile+first "
                      f"{total:.1f} s", flush=True)
            else:
                print(f"plen {plen} (bucket "
                      f"{eng.pick_bucket(plen)}): first token "
                      f"{t_first*1e3:6.0f} ms, decode "
                      f"{(len(toks)-1)/(total-t_first):6.1f} tok/s",
                      flush=True)


if __name__ == "__main__":
    main()
