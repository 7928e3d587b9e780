"""Decode-step profiling experiment (run on the real TPU chip).

Isolates where the bf16 single-stream decode step spends time relative to
the HBM roofline:

  calib   — raw achievable HBM read bandwidth (reduce over all params)
  V0      — library decode (engine._decode_impl path) at several chunk sizes
  V1      — cache-in-carry variant: KV cache carried through the layer scan
            and updated with a tiny dynamic_update_slice instead of being
            consumed as scan-xs and rewritten as stacked scan-ys
  V2      — V1 with the attention cache *read* removed (isolates KV read)

Usage: python tools/exp_decode_profile.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.models import llama
from valley_tpu.ops.attention import decode_attention


def sync(x):
    # axon: block_until_ready doesn't synchronize; force a host transfer
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    cfg = C.valley_7b()
    tcfg = cfg.text
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda k: llama.init_params(tcfg, k, dtype=dtype), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype), shapes)
    jax.block_until_ready(params)
    pbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"params: {pbytes/1e9:.2f} GB")

    # -- calibration: achievable HBM read bw ------------------------------
    @jax.jit
    def reduce_all(p):
        # 4 passes inside one executable to amortize dispatch (~25 ms)
        def body(acc, _):
            return acc + sum(jnp.sum(x, dtype=jnp.float32)
                             for x in jax.tree.leaves(p)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return acc

    t, _ = timeit(reduce_all, params)
    print(f"calib reduce-all x4: {t*1e3:.2f} ms -> "
          f"{4*pbytes/t/1e9:.1f} GB/s")

    smax = 640
    cache = llama.init_cache(tcfg, 1, smax, dtype)
    cbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cache))
    print(f"cache: {cbytes/1e9:.3f} GB")
    valid = (jnp.arange(smax)[None] < 472)
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), 472, jnp.int32)
    slot = jnp.int32(472)

    # -- V0: library decode (same structure as engine._decode_impl) -------
    def v0(params, cache, valid, token, slot, seq, *, n):
        def body(carry, _):
            token, cache, valid, seq, slot = carry
            embeds = llama.embed(params, token[:, None])
            valid2 = jax.lax.dynamic_update_slice(
                valid, jnp.ones((1, 1), valid.dtype), (0, slot))
            hidden, cache = llama.forward_hidden(
                params, tcfg, embeds, positions=seq[:, None], cache=cache,
                cache_index=slot, kv_valid=valid2, use_flash=False)
            logits = llama.logits_from_hidden(params, hidden)[:, 0]
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (tok, cache, valid2, seq + 1, slot + 1), tok

        (token, cache, valid, seq, _), toks = jax.lax.scan(
            body, (token, cache, valid, seq, slot), None, length=n)
        return toks, cache, valid, seq

    # -- V1: cache carried whole through the layer loop -------------------
    def layer_step_carry(lp, x, k_all, v_all, li, cfg, cos, sin, slot, valid,
                         read_cache=True):
        """One decoder layer; k_all/v_all are the FULL (L,B,S,H,D) caches,
        updated in place (carry) with only the new token's K/V."""
        xa = llama.rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        b, s, h = xa.shape
        q = (xa @ lp["wq"]).reshape(b, s, cfg.num_attention_heads,
                                    cfg.head_dim)
        k = (xa @ lp["wk"]).reshape(b, s, cfg.kv_heads, cfg.head_dim)
        v = (xa @ lp["wv"]).reshape(b, s, cfg.kv_heads, cfg.head_dim)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype)[None], (li, 0, slot, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype)[None], (li, 0, slot, 0, 0))
        if read_cache:
            ck = jax.lax.dynamic_index_in_dim(k_all, li, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(v_all, li, keepdims=False)
            out = decode_attention(q, ck, cv, valid)
        else:
            out = q
        x = x + out.reshape(b, s, h) @ lp["wo"]
        xm = llama.rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu((xm @ lp["w_gate"]).astype(jnp.float32))
        up = (xm @ lp["w_up"]).astype(jnp.float32)
        x = x + (gate * up).astype(xm.dtype) @ lp["w_down"]
        return x, k_all, v_all

    def make_v1(read_cache):
        def v1(params, cache, valid, token, slot, seq, *, n):
            def body(carry, _):
                token, k_all, v_all, valid, seq, slot = carry
                x = llama.embed(params, token[:, None])
                valid2 = jax.lax.dynamic_update_slice(
                    valid, jnp.ones((1, 1), valid.dtype), (0, slot))
                cos, sin = llama.rope_cos_sin(seq[:, None], tcfg.head_dim,
                                              tcfg.rope_theta)

                def layer_body(carry2, lp):
                    x, k_all, v_all, li = carry2
                    x, k_all, v_all = layer_step_carry(
                        lp, x, k_all, v_all, li, tcfg, cos, sin, slot,
                        valid2, read_cache=read_cache)
                    return (x, k_all, v_all, li + 1), None

                (x, k_all, v_all, _), _ = jax.lax.scan(
                    layer_body, (x, k_all, v_all, jnp.int32(0)),
                    params["layers"])
                x = llama.rms_norm(x, params["final_norm"],
                                   tcfg.rms_norm_eps)
                logits = llama.logits_from_hidden(params, x)[:, 0]
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                return (tok, k_all, v_all, valid2, seq + 1, slot + 1), tok

            (token, k_all, v_all, valid, seq, _), toks = jax.lax.scan(
                body, (token, cache.k, cache.v, valid, seq, slot), None,
                length=n)
            return toks, llama.KVCache(k_all, v_all), valid, seq
        return v1

    for name, fn, n in [
        ("V0 n=16", v0, 16), ("V0 n=32", v0, 32), ("V0 n=64", v0, 64),
        ("V1 n=32", make_v1(True), 32), ("V1 n=64", make_v1(True), 64),
        ("V2-noKVread n=32", make_v1(False), 32),
    ]:
        jf = jax.jit(functools.partial(fn, n=n),
                     donate_argnames=("cache", "valid"))
        # fresh copies every call — donation invalidates the inputs
        ts = []
        for _ in range(4):
            c = jax.tree.map(jnp.copy, cache)
            va = jnp.copy(valid)
            sync(c)
            t0 = time.perf_counter()
            out = jf(params, c, va, token, slot, seq)
            sync(out[0])
            ts.append(time.perf_counter() - t0)
        per_tok = min(ts) / n * 1e3
        print(f"{name}: {min(ts)*1e3:.1f} ms total, {per_tok:.2f} ms/tok, "
              f"{1e3/per_tok:.1f} tok/s")


if __name__ == "__main__":
    main()
