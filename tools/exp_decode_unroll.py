"""Decode-step micro-sweep: layer-scan unroll factor + component costs.

Round-2 perf hunt: measured decode is 18.7 ms/token vs ~18.0 ms at the
measured GEMV bandwidth (747 GB/s over 13.4 GB streamed).  This sweeps
the knobs that could account for the ~0.7 ms/token of non-bandwidth
overhead:

  unroll=K   — engine decode with the layer scan unrolled K-fold
  nohead     — decode body without the lm_head matmul (isolates head cost)
  noattn     — without the cache attention read (isolates attention cost)
  hlo        — scans the compiled decode HLO for large unfused copies

Usage: python tools/exp_decode_unroll.py [n_steps]
"""

from __future__ import annotations

import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import llama, valley


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def build_params(cfg, fused=False):
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16,
                                     fused=fused),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    return params


def time_engine_decode(eng, params, n, smax=640, plen=472, iters=4):
    cache = llama.init_cache(eng.cfg.text, 1, smax, eng.cache_dtype)
    valid = jnp.arange(smax)[None] < plen
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), plen, jnp.int32)
    key = jax.random.key(0)
    ts = []
    out = None
    for _ in range(iters + 1):
        c = jax.tree.map(jnp.copy, cache)
        va = jnp.copy(valid)
        sync(c)
        t0 = time.perf_counter()
        out = eng._decode(params, c, va, token, jnp.int32(plen), seq, key,
                          1.0, 1.0, do_sample=False, n_steps=n)
        sync(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts[1:]), out


def hlo_copy_scan(eng, params, n, smax=640, plen=472):
    cache = llama.init_cache(eng.cfg.text, 1, smax, eng.cache_dtype)
    valid = jnp.arange(smax)[None] < plen
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), plen, jnp.int32)
    key = jax.random.key(0)
    lowered = jax.jit(
        eng._decode_impl, static_argnames=("do_sample", "n_steps"),
        donate_argnames=("cache", "valid")).lower(
        params, cache, valid, token, jnp.int32(plen), seq, key,
        1.0, 1.0, do_sample=False, n_steps=n)
    txt = lowered.compile().as_text()
    sizes = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "pred": 1}
    total = 0
    biggest = []
    for m in re.finditer(r"= (\w+)\[([\d,]*)\]\S* copy\(", txt):
        dt, dims = m.group(1), m.group(2)
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        nb = nelem * sizes.get(dt, 4)
        total += nb
        if nb > 1 << 20:
            biggest.append((nb, m.group(0)[:90]))
    biggest.sort(reverse=True)
    print(f"HLO copies: total {total/1e6:.1f} MB per call "
          f"({total/n/1e6:.2f} MB/token)")
    for nb, s in biggest[:8]:
        print(f"  {nb/1e6:8.1f} MB  {s}")
    # large converts (potential unfused dequant copies)
    totc = 0
    for m in re.finditer(r"= (\w+)\[([\d,]*)\]\S* convert\(", txt):
        dt, dims = m.group(1), m.group(2)
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        nb = nelem * sizes.get(dt, 4)
        if nb > 1 << 20:
            totc += nb
    print(f"HLO standalone converts >1MB: {totc/1e6:.1f} MB per call")


def main():
    # one variant per process — a 16 GB chip can't hold several compiled
    # 7B decode executables' arenas at once
    mode = sys.argv[1] if len(sys.argv) > 1 else "unroll1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    params = build_params(cfg, fused=mode.startswith("fused"))

    if mode.startswith("fused"):
        # fused wqkv/w_gateup serving layout (llama.fuse_llama_params)
        t0 = time.perf_counter()
        eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                     cache_dtype=jnp.int8, steps_per_call=n)
        t, _ = time_engine_decode(eng, params, n)
        print(f"{mode}: {t*1e3:7.1f} ms / {n} steps = "
              f"{t/n*1e3:.3f} ms/tok, {n/t:6.1f} tok/s "
              f"(compile+sweep {time.perf_counter()-t0:.0f}s)", flush=True)
        return
    if mode.startswith("unroll"):
        unroll = int(mode[len("unroll"):])
        t0 = time.perf_counter()
        eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                     cache_dtype=jnp.int8, steps_per_call=n,
                     decode_unroll=unroll)
        t, _ = time_engine_decode(eng, params, n)
        print(f"unroll={unroll}: {t*1e3:7.1f} ms / {n} steps = "
              f"{t/n*1e3:.3f} ms/tok, {n/t:6.1f} tok/s "
              f"(compile+sweep {time.perf_counter()-t0:.0f}s)", flush=True)
        return
    if mode in ("kernel", "kernel-bf16"):
        kv = jnp.bfloat16 if mode.endswith("bf16") else jnp.int8
        t0 = time.perf_counter()
        eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                     cache_dtype=kv, steps_per_call=n, decode_kernel=True)
        t, _ = time_engine_decode(eng, params, n)
        print(f"{mode}: {t*1e3:7.1f} ms / {n} steps = "
              f"{t/n*1e3:.3f} ms/tok, {n/t:6.1f} tok/s "
              f"(compile+sweep {time.perf_counter()-t0:.0f}s)", flush=True)
        return
    if mode.startswith("kmicro"):
        # standalone kernel sweep: R passes x L layers inside one jit
        from valley_tpu.ops.decode_pallas import decode_attention_stacked

        tcfg = cfg.text
        L = tcfg.num_hidden_layers
        smax, R = 640, 8
        cache = llama.init_cache(
            tcfg, 1, smax,
            jnp.bfloat16 if mode.endswith("bf16") else jnp.int8)
        jax.block_until_ready(cache)
        q = jnp.full((1, 1, tcfg.num_attention_heads, tcfg.head_dim),
                     0.01, jnp.bfloat16)
        mask = jnp.arange(smax)[None] < 472
        nbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(cache))

        @jax.jit
        def run(q, cache):
            def pass_(q, _):
                def layer(carry, _):
                    q, li = carry
                    o = decode_attention_stacked(
                        q, cache.k, cache.v, li, mask,
                        k_scale=cache.k_scale, v_scale=cache.v_scale)
                    return ((q + o * 1e-6).astype(q.dtype), li + 1), None
                (q, _), _ = jax.lax.scan(layer, (q, jnp.int32(0)), None,
                                         length=L)
                return q, None
            q, _ = jax.lax.scan(pass_, q, None, length=R)
            return q

        out = run(q, cache)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(q, cache)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        per_layer = t / (R * L) * 1e6
        print(f"kmicro: {t*1e3:.1f} ms for {R}x{L} calls = "
              f"{per_layer:.1f} us/call, {R*nbytes/t/1e9:.0f} GB/s")
        return
    if mode in ("hlo", "hlo-kernel"):
        eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                     cache_dtype=jnp.int8, steps_per_call=n,
                     decode_kernel=mode == "hlo-kernel")
        hlo_copy_scan(eng, params, n)
        return

    # component costs: nohead / noattn via surgical monkeypatch
    import valley_tpu.models.llama as L

    if mode == "nohead":
        L.logits_from_hidden = lambda p, h: (
            h[..., :1].astype(jnp.float32) *
            jnp.zeros((1, cfg.text.vocab_size), jnp.float32))
    elif mode == "noattn":
        L.decode_attention = lambda q, k, v, m, **kw: q
    else:
        raise SystemExit(f"unknown mode {mode}")
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                 cache_dtype=jnp.int8, steps_per_call=n)
    t, _ = time_engine_decode(eng, params, n)
    print(f"{mode}: {t*1e3:7.1f} ms -> {t/n*1e3:.3f} ms/tok, "
          f"{n/t:6.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
