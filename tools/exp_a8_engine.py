"""Why is the in-ENGINE W8A8 prefill slower when the isolated GEMM
chains (tools/exp_w8a8_prefill.py) measured 1.48x?

RESOLVED (round 5): it isn't — the round-4 bench A/B (int8 first_token
0.177 s vs int8a8 0.214 s) does NOT reproduce; it was one-sided fabric
drift, not a relayout.  Round-5 measurements on chip, same window:

    full8   75.5 ms   fulla8   50.0 ms  (1.51x)
    slice8  64.3 ms   slicea8  42.8 ms  (1.50x — the dynamic-sliced
                                         stacked weights quantize fine)
    slicea8b 44.2 ms  (bf16 quant math: no better than fp32)
    engine8 first-token 74.0 ms   enginea8 55.2 ms  (1.34x, text 512)

and the full video bench A/B (best-of-6 each, one window):
int8 first_token 0.160/0.155 s vs int8a8 0.141 s at identical decode
96.4-96.5 tok/s.  W8A8 prefill is an end-to-end first-token WIN
(~12%); int8a8 is now the bench flagship (bench.py).

Original round-4 hypothesis space, kept for the record — the suspects,
isolated here at 7B prefill shapes (B=1, S=512, fused serving layout):

  full8   : full llama.forward_hidden, int8 dequant-dot   [baseline]
  fulla8  : full llama.forward_hidden, W8A8 (_w8a8_dot)
  slice8  : scan over the stacked (L, out, in) int8 weights running
            ONLY the 4 fused projections, dequant-dot
  slicea8 : same scan, W8A8 — if this is slow while the
            exp_w8a8_prefill chains (fixed weight, no dynamic slice)
            were fast, the dynamic-sliced stacked weight forces a
            relayout/copy on the int8-MXU path
  slicea8b: same but activation quant in bf16 (no fp32 convert)

Each timed as best-of-N one-call dispatches (prefill-sized calls are
~2x the ~27 ms dispatch floor; both sides pay the same floor, the
DELTA is device time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_a8_engine.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

S = 512
N = 8


def _timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(N):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from valley_tpu import config as C
    from valley_tpu.models import llama
    from valley_tpu.ops.quant import quantize_llama_params

    cfg = C.valley_7b().text
    L, H = cfg.num_hidden_layers, cfg.hidden_size

    def build(act8):
        shapes = jax.eval_shape(
            lambda k: llama.init_params(cfg, k, dtype=jnp.bfloat16,
                                        fused=True), jax.random.key(0))
        p = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                         shapes)
        p = quantize_llama_params({"llama": p}, act8=act8)["llama"]
        jax.block_until_ready(p)
        return p

    x = jnp.full((1, S, H), 0.01, jnp.bfloat16)

    @jax.jit
    def full(p, x):
        h, _ = llama.forward_hidden(p, cfg, x, use_flash=True)
        return h

    # -- projection-only scan (the 4 fused GEMMs per layer, sliced from
    # the stacked weights exactly as the model's scan does) ------------
    def proj_scan(layers, x, mode):
        names = ("wqkv", "wo", "w_gateup", "w_down")

        def body(h, i):
            out = h
            for nm in names:
                w = jax.lax.dynamic_index_in_dim(layers[nm], i,
                                                 keepdims=False)
                skey = nm + ("_scale_a8" if mode != "w8"
                             else "_scale")
                s = jax.lax.dynamic_index_in_dim(layers[skey], i,
                                                 keepdims=False)
                t = out.reshape(-1, out.shape[-1])
                k = w.shape[1]
                if t.shape[1] < k:          # w_down eats 11008 inputs
                    reps = -(-k // t.shape[1])
                    t = jnp.concatenate([t] * reps, 1)[:, :k]
                if mode == "w8":
                    y = jax.lax.dot_general(
                        t, w.astype(t.dtype), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = y * s[None, :].astype(jnp.float32)
                elif mode == "a8":          # fp32 quant math (_w8a8_dot)
                    tf = t.astype(jnp.float32)
                    a = jnp.maximum(jnp.max(jnp.abs(tf), -1,
                                            keepdims=True), 1e-6) / 127.0
                    tq = jnp.round(tf / a).astype(jnp.int8)
                    y = jax.lax.dot_general(
                        tq, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    y = y.astype(jnp.float32) * a \
                        * s[None, :].astype(jnp.float32)
                else:                        # a8b: bf16 quant math
                    a = jnp.maximum(jnp.max(jnp.abs(t), -1,
                                            keepdims=True),
                                    jnp.bfloat16(1e-6)) / 127.0
                    tq = jnp.round(t / a).astype(jnp.int8)
                    y = jax.lax.dot_general(
                        tq, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    y = y.astype(jnp.float32) * a.astype(jnp.float32) \
                        * s[None, :].astype(jnp.float32)
                # fold back to (S, H) so the chain stays shape-stable
                y = y[:, :out.shape[-1]]
                out = y.reshape(out.shape).astype(jnp.bfloat16)
            return out, None

        h, _ = jax.lax.scan(body, x, jnp.arange(layers["wqkv"].shape[0]))
        return h

    print(f"backend={jax.default_backend()}  S={S}  L={L}")

    p8 = build(False)
    t_full8 = _timeit(full, p8, x)
    j8 = jax.jit(lambda lay, x: proj_scan(lay, x, "w8"))
    t_slice8 = _timeit(j8, p8["layers"], x[0])
    t_eng8 = engine_first_token(cfg, p8)
    del p8
    import gc

    gc.collect()

    pa = build(True)
    t_fulla8 = _timeit(full, pa, x)
    ja = jax.jit(lambda lay, x: proj_scan(lay, x, "a8"))
    t_slicea8 = _timeit(ja, pa["layers"], x[0])
    jb = jax.jit(lambda lay, x: proj_scan(lay, x, "a8b"))
    t_slicea8b = _timeit(jb, pa["layers"], x[0])
    t_enga8 = engine_first_token(cfg, pa)

    for k, v in [("full8", t_full8), ("fulla8", t_fulla8),
                 ("slice8", t_slice8), ("slicea8", t_slicea8),
                 ("slicea8b", t_slicea8b),
                 ("engine8 first-token", t_eng8),
                 ("enginea8 first-token", t_enga8)]:
        print(f"{k:22s} {v*1e3:8.1f} ms")


def engine_first_token(tcfg, llama_params):
    """Same-process ENGINE prefill->first-token A/B (text-only prompt at
    the 512 bucket; the vision tower is identical in both modes, so a
    text prompt isolates the LLM-prefill delta without paying the
    tower's extra compile time twice)."""
    from valley_tpu import config as C
    from valley_tpu.inference import Engine, GenerationConfig
    from valley_tpu.models import valley

    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998,
        vi_frame=31999, vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    rest = {k: jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                            v) for k, v in shapes.items() if k != "llama"}
    params = dict(rest, llama=llama_params)
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=8,
                 cache_dtype=jnp.int8, steps_per_call=7)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    rng = np.random.default_rng(0)
    prompt = [1] + rng.integers(5, 30000, size=470).tolist()

    def first():
        t0 = time.perf_counter()
        for t in eng.generate_tokens([prompt], gen=gen, eos_ids=[-1]):
            return time.perf_counter() - t0

    first()                                  # compile
    best = min(first() for _ in range(N))
    del eng, params, rest
    import gc

    gc.collect()
    return best


if __name__ == "__main__":
    main()
