"""Pooled streaming cadence with/without the decode ramp (real chip).

Measures what the pooled decode ramp actually buys a user: a request
admitted into a busy continuous-batching pool streams its first tokens
after ramp-size chunks (a few steps) instead of waiting out a full
steady-state chunk.  The first token is emitted at insert time (the
prefill-sampled token), so the ramp governs the token-2..k cadence.

One mode per process (fresh executables, no cross-mode compile reuse):

    python tools/exp_pool_ttfc.py off    # decode_ramp=()
    python tools/exp_pool_ttfc.py 2,6    # ramped

Prints per-token arrival times for a request joining a pool that is
mid-decode on a long-running row, plus the long row's throughput (the
ramp's cost: a few extra dispatches while the newcomer matures).
"""

from __future__ import annotations

import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.inference.continuous import ContinuousEngine, _drain
from valley_tpu.models import valley


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "2,6"
    ramp = () if arg == "off" else tuple(int(s) for s in arg.split(","))
    steps = int(os.environ.get("VALLEY_POOL_STEPS", "16"))
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    from valley_tpu.ops.quant import quantize_llama_params

    params = quantize_llama_params(params, bits=8)
    jax.block_until_ready(params)

    eng = Engine(cfg, params, buckets=(128, 512), max_new_tokens=128,
                 cache_dtype=jnp.int8, steps_per_call=steps,
                 decode_ramp=ramp)
    cont = ContinuousEngine(eng, rows=4, bucket=512, extra_slots=128)
    print(f"ramp={ramp or 'off'} steps={steps}; warmup...", flush=True)
    t0 = time.perf_counter()
    cont.warmup()
    print(f"warm in {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    long_prompt = rng.integers(5, 30000, size=420).tolist()
    short_prompt = rng.integers(5, 30000, size=60).tolist()

    # long row A decodes to steady state, then B joins mid-flight
    a_counts = {}

    def consume_a(outq):
        n = 0
        t_start = time.perf_counter()
        for _ in _drain(outq):
            n += 1
        a_counts["n"] = n
        a_counts["dt"] = time.perf_counter() - t_start

    qa = cont.submit(long_prompt, max_new_tokens=96, eos_id=-1)
    tha = threading.Thread(target=consume_a, args=(qa,))
    tha.start()
    time.sleep(1.5)          # A is mid-decode in steady-state chunks

    t_submit = time.perf_counter()
    qb = cont.submit(short_prompt, max_new_tokens=24, eos_id=-1)
    arrivals = []
    for _ in _drain(qb):
        arrivals.append(time.perf_counter() - t_submit)
    tha.join(timeout=300)

    ms = [f"{t * 1e3:.0f}" for t in arrivals[:10]]
    print(f"B arrivals (ms after submit): {' '.join(ms)}")
    print(f"  tok1 (admission+prefill) {arrivals[0]*1e3:.0f} ms; "
          f"tok2 {arrivals[1]*1e3:.0f} ms; "
          f"tok5 {arrivals[4]*1e3:.0f} ms; "
          f"tok10 {arrivals[9]*1e3:.0f} ms")
    print(f"A: {a_counts['n']} tokens in {a_counts['dt']:.2f} s -> "
          f"{a_counts['n']/a_counts['dt']:.1f} tok/s while sharing the pool")


if __name__ == "__main__":
    main()
