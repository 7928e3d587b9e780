"""int8 decode GEMV bandwidth hunt (round 3, VERDICT item 1).

Round 2 measured the int8 flagship at 96.3 tok/s (~650 GB/s effective
weight streaming) vs bf16's 715 GB/s — this isolates where int8 GEMVs
lose bandwidth.  Chains mirror tools/exp_gemv_bw.py (alternating-dim
GEMVs, carry-dependent, R passes per executable, no scalar-reduce
barriers):

  bf16      — bf16 chain, (in, out) plain @         (747 GB/s in r2)
  bf16oi    — bf16 chain, (out, in) einsum           (serving layout)
  deq       — int8 dequant chain, (in, out) plain @
  deqoi     — int8 dequant chain, (out, in) einsum   (the serving path)
  s8s8      — native int8 MXU dot + per-token activation quant (W8A8)
  s8s8oi    — same, (out, in) orientation
  sum       — jnp.sum over the same int8 bytes (read ceiling)

Usage: python tools/exp_int8_gemv.py [mode] [R]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, H, F = 32, 4096, 11008


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


from functools import partial


@partial(jax.jit, static_argnums=0)
def _mk_int8_slice(n, base):
    x = jnp.arange(n, dtype=jnp.int32) + base
    return ((x % 251) - 125).astype(jnp.int8)


def _mk_int8(shape):
    # per-leading-dim device-side build: a full-size int32 arange temp is
    # ~6 GB of HBM (OOMs at 3 tensors), while building on the host pays a
    # multi-GB transfer through the axon tunnel (minutes) — per-slice
    # temps are ~4x slice bytes (~0.7 GB here)
    n = int(np.prod(shape[1:]))
    out = jnp.stack([_mk_int8_slice(n, jnp.int32(i * (n % 251)))
                     for i in range(shape[0])])
    return out.reshape(shape)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "deqoi"
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    int8 = mode.startswith(("deq", "s8s8", "sum"))
    oi = mode.endswith("oi")
    x0 = jnp.full((1, H), 0.01, jnp.bfloat16)
    nbytes = 0
    if not mode.startswith(("mlp", "layer7b")):
        # chain operands (the mlp/layer7b modes build their own weights)
        if int8:
            a = _mk_int8((L, F, H) if oi else (L, H, F))  # x(1,H)->(1,F)
            b = _mk_int8((L, H, F) if oi else (L, F, H))  # back to (1,H)
            sa = jnp.full((L, F), 0.01, jnp.bfloat16)
            sb = jnp.full((L, H), 0.01, jnp.bfloat16)
        else:
            dt = jnp.bfloat16
            a = jnp.full((L, F, H) if oi else (L, H, F), 0.01, dt)
            b = jnp.full((L, H, F) if oi else (L, F, H), 0.01, dt)
            sa = sb = None
        nbytes = a.size * a.dtype.itemsize + b.size * b.dtype.itemsize
        jax.block_until_ready((a, b, x0))

    def gemv(x, w, s):
        if mode.startswith("s8s8"):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sx = jnp.maximum(amax, 1e-6).astype(jnp.float32) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            dims = (((1,), (1,)), ((), ())) if oi else \
                (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(xq, w, dims,
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx
                    * s.astype(jnp.float32)).astype(jnp.bfloat16)
        if int8:
            if oi:
                y = jnp.einsum("bi,oi->bo", x, w.astype(x.dtype),
                               preferred_element_type=jnp.float32)
            else:
                y = jnp.einsum("bi,io->bo", x, w.astype(x.dtype),
                               preferred_element_type=jnp.float32)
            return (y * s.astype(jnp.float32)).astype(x.dtype)
        return (jnp.einsum("bi,oi->bo", x, w) if oi else x @ w) * 1e-3

    if mode.startswith("layer7b"):
        # the engine's ACTUAL per-layer decode GEMV chain at 7B fused
        # shapes: wqkv (H->3H), wo (H->H), w_gateup (H->2F), w_down
        # (F->H), all (out, in) like the serving layout.  Variants:
        #   layer7b     — int8 dequant-dot (the shipped path)
        #   layer7bs8   — native int8 MXU dot, per-token activation quant
        #   layer7bbf   — bf16 weights (2x bytes)
        kind = mode[len("layer7b"):] or "deq"
        shp = [(3 * H, H), (H, H), (2 * F, H), (H, F)]
        i8 = kind != "bf"
        if i8:
            ws = [_mk_int8((L,) + s) for s in shp]
            ss = [jnp.full((L, s[0]), 0.01, jnp.bfloat16) for s in shp]
        else:
            ws = [jnp.full((L,) + s, 0.01, jnp.bfloat16) for s in shp]
            ss = [jnp.zeros((L, 1), jnp.bfloat16) for s in shp]
        nbytes = sum(w.size * w.dtype.itemsize for w in ws)
        jax.block_until_ready(ws)

        def proj(x, w, s):
            if kind == "s8":
                amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                sx = jnp.maximum(amax, 1e-6).astype(jnp.float32) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y.astype(jnp.float32) * sx *
                        s.astype(jnp.float32)).astype(jnp.bfloat16)
            y = jnp.einsum("bi,oi->bo", x, w.astype(x.dtype),
                           preferred_element_type=jnp.float32)
            return ((y * s.astype(jnp.float32)).astype(x.dtype) if i8
                    else y.astype(x.dtype) * 1e-2)

        @jax.jit
        def run(ws, ss, x0):
            def pass_(x, _):
                def body(x, wss):
                    (w1, w2, w3, w4), (s1, s2, s3, s4) = wss
                    a = proj(x, w1, s1)                     # (1, 3H)
                    x = x + proj(a[:, :H] * 1e-2, w2, s2)   # attn out
                    g = proj(x.astype(jnp.bfloat16), w3, s3)  # (1, 2F)
                    h = (g[:, :F] * g[:, F:] * 1e-4).astype(jnp.bfloat16)
                    x = x + proj(h, w4, s4)
                    return (x * 1e-1).astype(jnp.bfloat16), None
                x, _ = jax.lax.scan(body, x, (tuple(ws), tuple(ss)))
                return x, None
            x, _ = jax.lax.scan(pass_, x0, None, length=r)
            return x
        args = (ws, ss, x0)
    elif mode in ("mlp", "mlpbf"):
        # llama-MLP-shaped layer: gate+up are INDEPENDENT (H->F) GEMVs,
        # down (F->H) depends on both — tests whether 2-wide GEMV
        # parallelism hides the dequant latency a serial chain exposes
        i8 = mode == "mlp"
        if i8:
            g = _mk_int8((L, F, H))
            u = _mk_int8((L, F, H))
            dn = _mk_int8((L, H, F))
            sg = jnp.full((L, F), 0.01, jnp.bfloat16)
            sd = jnp.full((L, H), 0.01, jnp.bfloat16)
        else:
            g = jnp.full((L, F, H), 0.01, jnp.bfloat16)
            u = jnp.full((L, F, H), 0.01, jnp.bfloat16)
            dn = jnp.full((L, H, F), 0.01, jnp.bfloat16)
            sg = sd = jnp.zeros((L, 1), jnp.bfloat16)
        nbytes = g.size * g.dtype.itemsize * 3
        jax.block_until_ready((g, u, dn))

        def proj(x, w, s):
            y = jnp.einsum("bi,oi->bo", x, w.astype(x.dtype),
                           preferred_element_type=jnp.float32)
            return (y * s.astype(jnp.float32)).astype(x.dtype) if i8 \
                else y.astype(x.dtype) * 1e-2

        @jax.jit
        def run(g, u, dn, sg, sd, x0):
            def pass_(x, _):
                def body(x, ws):
                    a = proj(x, ws[0], ws[3])
                    b = proj(x, ws[1], ws[3])
                    y = proj((a * b * 1e-4).astype(x.dtype), ws[2], ws[4])
                    return (x + y * 1e-2).astype(x.dtype), None
                x, _ = jax.lax.scan(body, x, (g, u, dn, sg, sd))
                return x, None
            x, _ = jax.lax.scan(pass_, x0, None, length=r)
            return x
        args = (g, u, dn, sg, sd, x0)
    elif mode == "sum":
        @jax.jit
        def run(a, b, x0):
            def pass_(x, _):
                s = jnp.sum(a, dtype=jnp.int32) + \
                    jnp.sum(b, dtype=jnp.int32)
                return x * (1 + s.astype(jnp.bfloat16) * 1e-9), None
            x, _ = jax.lax.scan(pass_, x0, None, length=r)
            return x
        args = (a, b, x0)
    else:
        @jax.jit
        def run(a, b, sa, sb, x0):
            def pass_(x, _):
                def body(x, ws):
                    y = gemv(x, ws[0], ws[2])         # (1, F)
                    return gemv(y, ws[1], ws[3]) * 1e-2, None
                x, _ = jax.lax.scan(body, x, (a, b, sa, sb)
                                    if int8 else (a, b, a[:, 0, :1],
                                                  b[:, 0, :1]))
                return x, None
            x, _ = jax.lax.scan(pass_, x0, None, length=r)
            return x
        args = (a, b, sa, sb, x0)

    out = run(*args)
    sync(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{mode}: {t*1e3:.1f} ms / {r} passes = {t/r*1e3:.2f} ms/pass, "
          f"{r*nbytes/t/1e9:.0f} GB/s effective "
          f"(runs: {[f'{x*1e3:.0f}' for x in ts]})")


if __name__ == "__main__":
    main()
