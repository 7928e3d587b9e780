"""Decompose the ~0.8 ms/step unattributed decode glue (VERDICT r3
item 2).

Round 3's engine-level ablation fit  decode_ms = bytes/802GB/s + 1.63ms
and attributed 0.56 ms to attention + 0.25 ms to lm_head; the remaining
~0.8 ms was asserted to be "norms/rope/KV-update/scan glue" but never
decomposed.  Subtractive ablation can't split it (removing a piece lets
XLA dead-code-eliminate its GEMV neighbours), so this tool measures each
component ADDITIVELY: a fused scan with the same geometry as the decode
loop (n_steps outer scan, 32-layer inner scan, B=1 Valley-7B shapes)
running ONLY that component, minus an empty-scan baseline (pure
scan/dispatch glue).  All carries keep the data live; nothing can be
DCE'd.

Components per decoded token:
  empty    — outer+inner scan with a trivial carry op (the glue floor)
  norms    — 2x rms_norm per layer + 1 final (fp32 mean/rsqrt on (4096,))
  rope     — rope_cos_sin at the step position + apply_rope on q,k
  kvwrite  — int8 KV quantize + the 4 dynamic_update_slice writes into
             the real stacked (L, 1, Smax, Hkv, D) cache buffers
  sample   — greedy sample_token (argmax over 32006 fp32 + compare)
             once per token (not per layer)
  embed    — one embedding-row gather per token (not per layer)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_decode_glue.py [component|all] [n_steps]

Numbers are chip-order-of-dispatch sensitive on the axon fabric — run
components back-to-back in one invocation ('all') for comparability.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C

L, H, HKV, D, V, SMAX = 32, 4096, 32, 128, 32006, 640


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :1].astype(
        jnp.float32)))


def timed(fn, args, n, iters=4, copy_args=False):
    ts = []
    for _ in range(iters + 1):
        a = [jax.tree.map(jnp.copy, x) for x in args] if copy_args \
            else args
        if copy_args:
            sync(a[0])
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts[1:]) / n


def make_component(name: str, n_steps: int):
    """Returns (jitted fn, args).  Every carry feeds the next iteration
    so no component can be dead-code-eliminated."""
    from valley_tpu.inference.engine import sample_token
    from valley_tpu.models.llama import rms_norm
    from valley_tpu.ops.rope import apply_rope, rope_cos_sin

    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, H), jnp.bfloat16)
    norm_w = jnp.ones((L, H), jnp.bfloat16)

    if name == "empty":
        def step(x, _):
            def layer(h, w):
                return h * jnp.float32(1.0).astype(h.dtype) + 0 * w[:1], \
                    None
            x, _ = jax.lax.scan(layer, x, norm_w)
            return x, None

        def fn(x):
            x, _ = jax.lax.scan(step, x, None, length=n_steps)
            return x
        return jax.jit(fn), (x0,)

    if name == "norms":
        def step(x, _):
            def layer(h, w):
                h = rms_norm(h, w, 1e-6)
                h = rms_norm(h, w, 1e-6)
                return h, None
            x, _ = jax.lax.scan(layer, x, norm_w)
            return rms_norm(x, norm_w[0], 1e-6), None

        def fn(x):
            x, _ = jax.lax.scan(step, x, None, length=n_steps)
            return x
        return jax.jit(fn), (x0,)

    if name == "rope":
        q0 = jax.random.normal(key, (1, 1, H // D, D), jnp.bfloat16)
        k0 = jax.random.normal(key, (1, 1, HKV, D), jnp.bfloat16)

        def step(carry, i):
            q, k = carry
            pos = jnp.full((1, 1), i, jnp.int32)

            def layer(qk, _):
                q, k = qk
                cos, sin = rope_cos_sin(pos, D)
                return (apply_rope(q, cos, sin),
                        apply_rope(k, cos, sin)), None
            (q, k), _ = jax.lax.scan(layer, (q, k), None, length=L)
            return (q, k), None

        def fn(q, k):
            (q, k), _ = jax.lax.scan(step, (q, k),
                                     jnp.arange(n_steps))
            return q
        return jax.jit(fn), (q0, k0)

    if name == "kvwrite":
        # the REAL write path: int8 quantize + _cache_write into the
        # stacked (L, 1, Smax, Hkv, D) buffers at a traced layer index,
        # exactly as _attn_cached does inside the layer scan
        from valley_tpu.models.llama import _cache_write, _quantize_kv

        ck = jnp.zeros((L, 1, SMAX, HKV, D), jnp.int8)
        cv = jnp.zeros((L, 1, SMAX, HKV, D), jnp.int8)
        ks = jnp.zeros((L, 1, SMAX, HKV), jnp.bfloat16)
        vs = jnp.zeros((L, 1, SMAX, HKV), jnp.bfloat16)
        k0 = jax.random.normal(key, (1, 1, HKV, D), jnp.bfloat16)

        def step(carry, i):
            ck, cv, ks, vs, k = carry

            def layer(c, li):
                ck, cv, ks, vs, k = c
                kq, ksc = _quantize_kv(k)
                vq, vsc = _quantize_kv(k * 1.0001)
                ck = _cache_write(ck, kq, li, i)
                cv = _cache_write(cv, vq, li, i)
                ks = _cache_write(ks, ksc, li, i)
                vs = _cache_write(vs, vsc, li, i)
                return (ck, cv, ks, vs, k), None
            (ck, cv, ks, vs, k), _ = jax.lax.scan(
                layer, (ck, cv, ks, vs, k), jnp.arange(L))
            return (ck, cv, ks, vs, k * 1.0001), None

        def fn(ck, cv, ks, vs, k):
            (ck, cv, ks, vs, k), _ = jax.lax.scan(
                step, (ck, cv, ks, vs, k), jnp.arange(n_steps))
            return ck

        return jax.jit(fn, donate_argnums=(0, 1, 2, 3)), \
            (ck, cv, ks, vs, k0)

    if name == "sample":
        logits0 = jax.random.normal(key, (1, V), jnp.float32)

        def step(carry, _):
            logits, k = carry
            k, sub = jax.random.split(k)
            tok = sample_token(logits, sub, 1.0, 1.0, False)
            logits = logits + tok[:, None].astype(jnp.float32) * 1e-9
            return (logits, k), None

        def fn(logits):
            (logits, _), _ = jax.lax.scan(step, (logits, key), None,
                                          length=n_steps)
            return logits
        return jax.jit(fn), (logits0,)

    if name == "embed":
        table = jax.random.normal(key, (V, H), jnp.bfloat16)

        def step(tok, _):
            row = table[tok[0]]
            tok = (tok + row[:1].astype(jnp.int32) * 0 + 1) % V
            return tok, None

        def fn(tok):
            tok, _ = jax.lax.scan(step, tok, None, length=n_steps)
            return tok
        return jax.jit(fn), (jnp.zeros((1,), jnp.int32),)

    if name == "composite":
        # every glue op together in one scan (captures intra-glue
        # interaction the isolated stages cannot)
        from valley_tpu.models.llama import (_cache_write, _quantize_kv,
                                             rms_norm)

        ck = jnp.zeros((L, 1, SMAX, HKV, D), jnp.int8)
        cv = jnp.zeros((L, 1, SMAX, HKV, D), jnp.int8)
        kss = jnp.zeros((L, 1, SMAX, HKV), jnp.bfloat16)
        vss = jnp.zeros((L, 1, SMAX, HKV), jnp.bfloat16)
        table = jax.random.normal(key, (V, H), jnp.bfloat16)
        logits0 = jax.random.normal(key, (1, V), jnp.float32)

        def step(carry, i):
            ck, cv, kss, vss, x, logits, k = carry
            tok = jnp.argmax(logits, -1)            # sample
            x = x + table[tok[0]][None] * 1e-6      # embed gather

            def layer(c, li):
                ck, cv, kss, vss, x = c
                h = rms_norm(x, norm_w[0], 1e-6)
                qh = h.reshape(1, 1, H // D, D)
                kh = h[:, :HKV * D].reshape(1, 1, HKV, D)
                pos = jnp.full((1, 1), i, jnp.int32)
                cos, sin = rope_cos_sin(pos, D)
                qh = apply_rope(qh, cos, sin)
                kh = apply_rope(kh, cos, sin)
                kq, ksc = _quantize_kv(kh)
                vq, vsc = _quantize_kv(kh * 1.0001)
                ck = _cache_write(ck, kq, li, i)
                cv = _cache_write(cv, vq, li, i)
                kss = _cache_write(kss, ksc, li, i)
                vss = _cache_write(vss, vsc, li, i)
                x = rms_norm(x + qh.reshape(1, H) * 1e-6, norm_w[0],
                             1e-6)
                return (ck, cv, kss, vss, x), None
            (ck, cv, kss, vss, x), _ = jax.lax.scan(
                layer, (ck, cv, kss, vss, x), jnp.arange(L))
            x = rms_norm(x, norm_w[0], 1e-6)
            k, sub = jax.random.split(k)
            logits = logits + x[:, :1].astype(jnp.float32) * 1e-9
            return (ck, cv, kss, vss, x, logits, k), None

        def fn(ck, cv, kss, vss, x, logits):
            (ck, cv, kss, vss, x, logits, _), _ = jax.lax.scan(
                step, (ck, cv, kss, vss, x, logits, key),
                jnp.arange(n_steps))
            return logits

        return jax.jit(fn, donate_argnums=(0, 1, 2, 3)), \
            (ck, cv, kss, vss, x0, logits0)

    raise SystemExit(f"unknown component {name}")


ALL = ("empty", "norms", "rope", "kvwrite", "sample", "embed",
       "composite")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    names = ALL if which == "all" else (which,)
    results = {}
    for name in names:
        fn, args = make_component(name, n)
        per = timed(fn, args, n,
                    copy_args=(name in ("kvwrite", "composite")))
        results[name] = per * 1e3
        print(f"{name:8s} {per*1e6:8.1f} us/token", flush=True)
    if "empty" in results:
        g = results["empty"]
        print(f"\nscan/dispatch glue floor: {g*1e3:.1f} us/token")
        total = 0.0
        for name in names:
            if name == "empty":
                continue
            net = max(0.0, results[name] - g)
            total += net
            print(f"{name:8s} net {net*1e3:8.1f} us/token")
        print(f"sum(net) + glue = {total*1e3 + g*1e3:.1f} us/token "
              f"(round-3 unattributed budget ~800 us)")


if __name__ == "__main__":
    main()
