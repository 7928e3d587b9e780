"""Experiment 2: true HBM calib + fused-weight decode variants.

V3 — cache-in-carry + wqkv fused into one (H, 3H) GEMV and gate/up fused
     into one (H, 2F) GEMV (fewer, larger HBM reads per layer).

Calib defeats CSE by scaling each pass with a carry-dependent factor.
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
from valley_tpu.ops.rope import apply_rope, rope_cos_sin


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def main():
    cfg = C.valley_7b()
    tcfg = cfg.text
    dtype = jnp.bfloat16
    L, H, F = (tcfg.num_hidden_layers, tcfg.hidden_size,
               tcfg.intermediate_size)
    V = tcfg.vocab_size

    def fused_shapes(_):
        return {
            "embed": jnp.zeros((V, H), dtype),
            "layers": {
                "wqkv": jnp.zeros((L, H, 3 * H), dtype),
                "wo": jnp.zeros((L, H, H), dtype),
                "w_gateup": jnp.zeros((L, H, 2 * F), dtype),
                "w_down": jnp.zeros((L, F, H), dtype),
                "attn_norm": jnp.zeros((L, H), dtype),
                "mlp_norm": jnp.zeros((L, H), dtype),
            },
            "final_norm": jnp.zeros((H,), dtype),
            "lm_head": jnp.zeros((H, V), dtype),
        }

    shapes = jax.eval_shape(fused_shapes, 0)
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    pbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"fused params: {pbytes/1e9:.2f} GB")

    # -- calib: carry-dependent scale so passes can't be CSE'd ------------
    @jax.jit
    def reduce_all(p, seed):
        def body(acc, i):
            s = sum(jnp.sum(x, dtype=jnp.float32) * (1.0 + acc * 1e-20)
                    for x in jax.tree.leaves(p))
            return acc + s * (i.astype(jnp.float32) + 1e-9), None
        acc, _ = jax.lax.scan(body, seed, jnp.arange(4))
        return acc

    out = reduce_all(params, jnp.float32(0)); sync(out)
    t0 = time.perf_counter()
    out = reduce_all(params, jnp.float32(1e-6)); sync(out)
    t = time.perf_counter() - t0
    print(f"calib x4 (CSE-proof): {t*1e3:.2f} ms -> {4*pbytes/t/1e9:.1f} GB/s"
          f" ({(t/4)*1e3:.2f} ms/pass)")

    smax = 640
    cache = llama.init_cache(tcfg, 1, smax, dtype)
    valid = (jnp.arange(smax)[None] < 472)
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), 472, jnp.int32)
    slot = jnp.int32(472)
    hd, nh, nkv = tcfg.head_dim, tcfg.num_attention_heads, tcfg.kv_heads

    def v3(params, cache, valid, token, slot, seq, *, n):
        def body(carry, _):
            token, k_all, v_all, valid, seq, slot = carry
            x = params["embed"][token[:, None]]
            valid2 = jax.lax.dynamic_update_slice(
                valid, jnp.ones((1, 1), valid.dtype), (0, slot))
            cos, sin = rope_cos_sin(seq[:, None], hd, tcfg.rope_theta)

            def layer_body(carry2, lp):
                x, k_all, v_all, li = carry2
                b, s, _ = x.shape
                xa = llama.rms_norm(x, lp["attn_norm"], tcfg.rms_norm_eps)
                qkv = xa @ lp["wqkv"]                       # (B,S,3H)
                q = qkv[..., :H].reshape(b, s, nh, hd)
                k = qkv[..., H:H + nkv * hd].reshape(b, s, nkv, hd)
                v = qkv[..., H + nkv * hd:].reshape(b, s, nkv, hd)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k.astype(k_all.dtype)[None], (li, 0, slot, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v.astype(v_all.dtype)[None], (li, 0, slot, 0, 0))
                ck = jax.lax.dynamic_index_in_dim(k_all, li, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(v_all, li, keepdims=False)
                out = decode_attention(q, ck, cv, valid2)
                x = x + out.reshape(b, s, H) @ lp["wo"]
                xm = llama.rms_norm(x, lp["mlp_norm"], tcfg.rms_norm_eps)
                gu = xm @ lp["w_gateup"]                    # (B,S,2F)
                act = (jax.nn.silu(gu[..., :F].astype(jnp.float32))
                       * gu[..., F:].astype(jnp.float32))
                x = x + act.astype(xm.dtype) @ lp["w_down"]
                return (x, k_all, v_all, li + 1), None

            (x, k_all, v_all, _), _ = jax.lax.scan(
                layer_body, (x, k_all, v_all, jnp.int32(0)),
                params["layers"])
            x = llama.rms_norm(x, params["final_norm"], tcfg.rms_norm_eps)
            logits = (x @ params["lm_head"]).astype(jnp.float32)[:, 0]
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (tok, k_all, v_all, valid2, seq + 1, slot + 1), tok

        (token, k_all, v_all, valid, seq, _), toks = jax.lax.scan(
            body, (token, cache.k, cache.v, valid, seq, slot), None,
            length=n)
        return toks, llama.KVCache(k_all, v_all), valid, seq

    for name, fn, n in [("V3 n=32", v3, 32), ("V3 n=64", v3, 64),
                        ("V3 n=128", v3, 128)]:
        jf = jax.jit(functools.partial(fn, n=n),
                     donate_argnames=("cache", "valid"))
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
