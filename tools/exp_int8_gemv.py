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


def _mk_int8(shape):
    # host-side build: an on-device int32 arange of this size is ~6 GB of
    # HBM temps per tensor (OOMs the 16 GB chip at 3 tensors)
    n = int(np.prod(shape))
    arr = ((np.arange(n, dtype=np.int32) % 251) - 125).astype(np.int8)
    return jax.device_put(arr.reshape(shape))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "deqoi"
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    int8 = mode.startswith(("deq", "s8s8", "sum"))
    oi = mode.endswith("oi")
    if int8:
        a = _mk_int8((L, F, H) if oi else (L, H, F))   # x(1,H) -> (1,F)
        b = _mk_int8((L, H, F) if oi else (L, F, H))   # back to (1,H)
        sa = jnp.full((L, F), 0.01, jnp.bfloat16)
        sb = jnp.full((L, H), 0.01, jnp.bfloat16)
    else:
        dt = jnp.bfloat16
        a = jnp.full((L, F, H) if oi else (L, H, F), 0.01, dt)
        b = jnp.full((L, H, F) if oi else (L, F, H), 0.01, dt)
        sa = sb = None
    nbytes = a.size * a.dtype.itemsize + b.size * b.dtype.itemsize
    x0 = jnp.full((1, H), 0.01, jnp.bfloat16)
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

    if mode in ("mlp", "mlpbf"):
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
