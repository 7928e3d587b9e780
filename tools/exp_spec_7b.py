"""Speculative decode at 7B on the real chip: round cost + upper bound.

Acceptance rate depends on real text (unavailable without real weights),
so this measures the two quantities that bound it instead:

* plain fused decode tok/s (baseline weight-streaming rate);
* speculative round time with FULL acceptance (constant perf weights
  make every draft match the argmax) — the (D+1)-wide verification pass
  streams the same weights as one decode step, so tokens/round / round
  time is the ceiling, and round_time/step_time is the overhead a
  zero-acceptance stream would pay.

Effective tok/s for any mean acceptance m:  (1 + m) / round_time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_spec_7b.py
VALLEY_BENCH_SIZE=13b additionally measures the 13B one-chip config
(int4gp nibble-packed weights by default — the 26 GB bf16 tree cannot
transiently exist on a 16 GB chip, so perf weights materialize
already-quantized via bench._perf_quant_params).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.inference.speculative import SpecConfig, SpecDecoder
from valley_tpu.models import valley


def main():
    size = os.environ.get("VALLEY_BENCH_SIZE", "7b")
    base = C.valley_7b() if size == "7b" else C.valley_13b()
    cfg = base.replace(
        tokens=C.SpecialTokens(im_patch=31996, im_start=31997,
                               im_end=31998, vi_frame=31999,
                               vi_start=31994, vi_end=31995))
    qmode = os.environ.get(
        "VALLEY_BENCH_QUANT", "int4gp" if size == "13b" else None)
    if size == "13b":
        # 26 GB bf16 tree cannot transiently exist on the 16 GB chip:
        # build the quantized tree in closed form (bit-identical to the
        # quantizer on a constant tree — tests/test_tools.py)
        import bench

        params = bench._perf_quant_params(cfg, fused=False, qmode=qmode)
    else:
        shapes = jax.eval_shape(
            lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
            jax.random.key(0))
        params = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.008, s.dtype), shapes)
        if qmode:
            from valley_tpu.ops.quant import (pack_int4_params,
                                              parse_quant_mode,
                                              quantize_llama_params)

            qm = parse_quant_mode(qmode)
            params = quantize_llama_params(params, bits=qm["bits"],
                                           group_size=qm["group_size"],
                                           act8=qm["act8"])
            if qm["packed"]:
                params = pack_int4_params(params)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    prompt = [1] + rng.integers(5, 30000, size=300).tolist()
    new = 255

    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=new + 1,
                 steps_per_call=new,
                 cache_dtype=jnp.int8 if size == "13b" else jnp.bfloat16,
                 decode_w4=qmode in ("int4", "int4g", "int4ga8"),
                 w4_packed=qmode in ("int4gp", "int4gpa8"))
    gen = GenerationConfig(max_new_tokens=new, do_sample=False)

    def run_plain():
        t0 = time.perf_counter()
        n = sum(1 for _ in eng.generate_tokens([prompt], None, gen,
                                               eos_ids=[-1]))
        return n, time.perf_counter() - t0

    run_plain()
    n, dt = min((run_plain() for _ in range(3)), key=lambda x: x[1])
    step_ms = dt / n * 1e3
    print(f"plain decode: {n / dt:.1f} tok/s ({step_ms:.2f} ms/step)")

    for d in (4, 8):
        dec = SpecDecoder(eng, SpecConfig(draft_len=d,
                                          rounds_per_call=32))

        def run_spec():
            t0 = time.perf_counter()
            n = sum(1 for _ in dec.generate_tokens(prompt, None, gen,
                                                   eos_ids=[-1]))
            return n, time.perf_counter() - t0

        run_spec()
        n_s, dt_s = min((run_spec() for _ in range(3)),
                        key=lambda x: x[1])
        # constant weights -> full acceptance from round 2 on; measure
        # rounds actually executed for the true per-round cost
        rounds = int(np.ceil((n_s - 1) / (d + 1))) + 1
        round_ms = dt_s / rounds * 1e3
        print(f"spec D={d}: {n_s} tokens in {dt_s:.2f}s = "
              f"{n_s / dt_s:.1f} tok/s (full-accept ceiling); "
              f"~{round_ms:.2f} ms/round = "
              f"{round_ms / step_ms:.2f}x a plain step; "
              f"break-even acceptance m >= "
              f"{round_ms / step_ms - 1:.2f} tokens/round")


if __name__ == "__main__":
    main()
