"""Speculative acceptance measured ON THE SERVED PATH (VERDICT r3
item 3's second half): real worker HTTP traffic, not offline replay.

Real Valley weights stay unreachable (zero egress), so the two
acceptance regimes are constructed from what random/constant weights
CAN produce end-to-end:

- **high-acceptance**: constant ("perf") weights make greedy argmax a
  fixed token; after two emissions the n-gram lookup drafts the loop
  and every draft verifies — the served-path analogue of an extractive
  reply (full-accept ceiling THROUGH the HTTP stack).
- **low-acceptance**: sampled traffic at temperature 1.0 over
  near-uniform logits — drafts almost never match the sampled token,
  the served-path analogue of fully-novel replies.  This is exactly the
  regime where the acceptance-adaptive controller must fall back to
  plain decode, so worst-case throughput stays ~plain instead of ~10%
  under.

Measures, via /worker_generate_stream + /worker_get_status:
  plain worker     greedy + sampled tok/s        (the baseline)
  --speculative    greedy + sampled tok/s        (ceiling + worst case)
  live acceptance  spec_accept_per_round, spec_disables

Decision rule printed at the end: flip --speculative default-on iff
worst-case (sampled/novel) throughput >= plain decode within fabric
noise AND the greedy ceiling shows the upside.  (Fabric drift: compare
only within this one invocation.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/e2e_spec_accept.py [max_new]
"""

import sys
import time

import numpy as np


def build_engine():
    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.models import valley
    from valley_tpu.inference import Engine
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    cfg = C.ValleyConfig(text=C.LLAMA2_7B, tokens=tk.special_tokens())
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    params = quantize_llama_params(params)
    jax.block_until_ready(params)
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=128,
                 cache_dtype=jnp.int8, steps_per_call=32,
                 decode_ramp=(2, 6))
    return eng, tk


def measure(worker_url: str, req: dict, tries: int = 3):
    """(first_chunk_ms, tok/s, n_chunks) best-of over warm requests."""
    from valley_tpu.serve.httpd import stream_chunks

    best = None
    for _ in range(tries):
        t0 = time.perf_counter()
        tf, n = None, 0
        for c in stream_chunks(worker_url + "/worker_generate_stream",
                               req, timeout=900):
            if tf is None:
                tf = time.perf_counter() - t0
            n += 1
        total = time.perf_counter() - t0
        if c["error_code"] != 0 or n < 3:
            continue
        tok = 2 * (n - 1)   # stream_interval=2
        tps = tok / (total - tf)
        if best is None or tps > best[1]:
            best = (tf * 1e3, tps, n)
    assert best is not None, "no successful measurement"
    return best


def main():
    import requests

    from valley_tpu.serve import model_worker as worker_mod
    from valley_tpu.serve.model_worker import ModelWorker

    max_new = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    eng, tk = build_engine()
    t0 = time.perf_counter()
    eng.warmup()
    print(f"engine warmup {time.perf_counter()-t0:.0f}s", flush=True)

    prompt = ("### Human: please repeat the following numbers exactly: "
              + " ".join(str(300 + i) for i in range(40))
              + "\n### Assistent:")
    greedy = {"model": "m", "prompt": prompt, "temperature": 0.0,
              "max_new_tokens": max_new, "stop": "@@nostop@@"}
    sampled = dict(greedy, temperature=1.0)

    results = {}
    for name, speculative in (("plain", False), ("spec", True)):
        worker = ModelWorker("http://localhost:1", "placeholder",
                             "m", eng, tk, no_register=True,
                             speculative=speculative)
        wapp = worker_mod.build_app(worker)
        wport = wapp.start()
        url = f"http://localhost:{wport}"
        t0 = time.perf_counter()
        worker.warmup_serving_paths()
        print(f"{name}: serving-path warmup "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        # one warm pass per request class (compiles anything left)
        for req in (greedy, sampled):
            measure(url, req, tries=1)
        for label, req in (("greedy", greedy), ("sampled", sampled)):
            tf, tps, n = measure(url, req)
            results[f"{name}/{label}"] = tps
            print(f"{name:5s} {label:7s}: first chunk {tf:6.0f} ms, "
                  f"{tps:6.1f} tok/s ({n} chunks)", flush=True)
        if speculative:
            stats = worker.get_status()["stats"]
            print(f"served acceptance: rounds={stats.get('spec_rounds')} "
                  f"emit/round={stats.get('spec_accept_per_round')} "
                  f"disables={stats.get('spec_disables')}", flush=True)
        wapp.shutdown()

    up = results["spec/greedy"] / results["plain/greedy"]
    worst = results["spec/sampled"] / results["plain/sampled"]
    print(f"\nceiling (greedy loop-accept): {up:.2f}x plain")
    print(f"worst case (novel sampled):   {worst:.2f}x plain")
    verdict = "FLIP --speculative DEFAULT-ON" if worst >= 0.95 and \
        up > 1.2 else "keep --speculative opt-in"
    print(f"decision rule (worst>=0.95x and ceiling>1.2x): {verdict}")


if __name__ == "__main__":
    main()
