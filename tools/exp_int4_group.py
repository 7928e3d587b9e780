"""Group-wise int4 dequant-dot: one more fusion attempt (VERDICT r3
item 5 second half).

The shipped grouped dequant (`llama._proj` einsum "...gi,ogi->...og")
compiles to per-group dots on this toolchain — 7.7 tok/s at 7B vs 129
for per-channel int4.  Candidate reformulations measured here at the
w_gate/w_up decode GEMV shape (the largest quantized matrices), int4
weights created INSIDE the executable (int4 cannot cross jit
boundaries, tools/exp_int4.py), stacked-scan harness like exp_int4b so
per-iteration time isolates the steady-state weight-read rate:

  perchan    int4 per-channel dequant-dot        (the 129 tok/s path)
  grouped    the shipped einsum                  (the 7.7 tok/s path)
  blockdiag  ONE dense GEMM against a block-diagonal expansion of x:
             P[o,g] = sum_k W[o,k] * X2[k,g],  X2[k,g] = x[k]*[g==k//gs]
             y[o]   = sum_g P[o,g] * s[o,g]
             The MXU computes up to 128 output columns in a single
             weight pass, so G=K/128 (32..86) extra columns ride the
             SAME weight stream the plain GEMV pays — group scales cost
             one tiny (o,G) elementwise+reduce instead of G dots.
             (Only valid at small batch: columns = B*G must stay ~<=128
             for the free ride; decode is B=1..4, exactly where int4
             latency mode lives.)
  pallas     grouped Pallas matvec (int4 tiles dequantized in VMEM),
             in case Mosaic streams int4 better than XLA's dot fusion.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int4_group.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


K, N, GS, REPS = 4096, 11008, 128, 8
G = K // GS


def perchan(x, w4, s_chan, s_grp):
    # s_chan (N,)
    y = jax.lax.dot_general(x, w4.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y * s_chan.astype(jnp.float32)


def grouped(x, w4, s_chan, s_grp):
    # the shipped path: s_grp (N, G); w (N, K) -> (N, G, GS)
    wg = w4.reshape(N, G, GS).astype(jnp.bfloat16)
    xg = x.reshape(x.shape[0], G, GS)
    part = jnp.einsum("bgi,ogi->bog", xg, wg,
                      preferred_element_type=jnp.float32)
    return jnp.sum(part * s_grp.astype(jnp.float32), axis=-1)


def blockdiag(x, w4, s_chan, s_grp):
    b = x.shape[0]
    eye = jnp.eye(G, dtype=x.dtype)
    # X2 (K, b*G): x scattered block-diagonally over groups
    x2 = (x.reshape(b, G, GS, 1) * eye[None, :, None, :])
    x2 = jnp.moveaxis(x2, 0, 2).reshape(K, b * G)
    p = jax.lax.dot_general(w4.astype(jnp.bfloat16), x2,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = p.reshape(N, b, G)
    y = jnp.sum(p * s_grp[:, None, :].astype(jnp.float32), axis=-1)
    return y.T                                    # (b, N)


def pallas_grouped(x, w4, s_chan, s_grp):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    block_n = 512

    def kern(x_ref, w_ref, s_ref, o_ref):
        # x (G, GS); w (bn, G, GS) int4; s (bn, G)
        w = w_ref[...].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            x_ref[...], jnp.swapaxes(w, 0, 1),
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (G, bn)
        o_ref[...] = jnp.sum(
            part * s_ref[...].astype(jnp.float32).T, axis=0,
            keepdims=True)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        grid=(pl.cdiv(N, block_n),),
        in_specs=[
            pl.BlockSpec((G, GS), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, G, GS), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, G), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N, bytes_accessed=K * N // 2 + K * 2 + N * 4,
            transcendentals=0),
    )(x.reshape(G, GS), w4.reshape(N, G, GS), s_grp)
    return out


VARIANTS = {"perchan": perchan, "grouped": grouped,
            "blockdiag": blockdiag, "pallas": pallas_grouped}


def make_loop(fn):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, w8, s_chan, s_grp, iters):
        w4 = w8.astype(jnp.int4)

        def body(x_c, _):
            def inner(ci, args):
                wi, sci, sgi = args
                y = fn(x_c, wi, sci, sgi)
                return ci + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(inner, 0.0, (w4, s_chan, s_grp))
            x_next = (x_c * (1.0 + 1e-12 * acc).astype(jnp.bfloat16))
            return x_next, acc
        x_fin, accs = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(accs) + jnp.sum(x_fin.astype(jnp.float32))
    return loop


def batch_sweep():
    """blockdiag vs grouped at pooled-decode batch sizes, both GEMV
    geometries (gate/up K=4096 G=32; down K=11008 G=86) — sets the
    dispatch threshold in llama._proj."""
    rng = np.random.default_rng(1)
    for (k, n) in ((4096, 11008), (11008, 4096)):
        g = k // GS
        w8 = jnp.asarray(rng.integers(-7, 8, (REPS, n, k)), jnp.int8)
        s_chan = jnp.asarray(rng.standard_normal((REPS, n)) * .01 + 1,
                             jnp.bfloat16)
        s_grp = jnp.asarray(rng.standard_normal((REPS, n, g)) * .01 + 1,
                            jnp.bfloat16)
        nbytes = REPS * k * n / 2
        # b=5 and b=9 are the speculative verification widths (D+1 at
        # the default draft lengths 4/8); 2..9 map the multi-tile
        # blockdiag region (b*g > 128) that sets llama._proj's gate
        for b in (1, 2, 4, 5, 8, 9, 16, 32):
            x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
            for name in ("blockdiag", "grouped"):
                fn = VARIANTS[name]

                def fk(xx, ww, sc, sg, fn=fn, n=n, k=k, g=g):
                    return _with_dims(fn, xx, ww, sc, sg, n, k, g)
                loop = make_loop(fk)
                times = {}
                try:
                    for iters in (4, 24):
                        float(loop(x, w8, s_chan, s_grp, iters))
                        t0 = time.perf_counter()
                        float(loop(x, w8, s_chan, s_grp, iters))
                        times[iters] = time.perf_counter() - t0
                    per_iter = (times[24] - times[4]) / 20
                    gbps = nbytes / per_iter / 1e9
                    print(f"K={k:5d} b={b:2d} {name:9s}: "
                          f"{per_iter*1e3:8.3f} ms/iter ({gbps:6.1f} GB/s)",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"K={k:5d} b={b:2d} {name:9s}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def _with_dims(fn, x, w4, s_chan, s_grp, n, k, g):
    global N, K, G
    oN, oK, oG = N, K, G
    N, K, G = n, k, g
    try:
        return fn(x, w4, s_chan, s_grp)
    finally:
        N, K, G = oN, oK, oG


def main():
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-7, 8, (REPS, N, K)), jnp.int8)
    s_chan = jnp.asarray(rng.standard_normal((REPS, N)) * .01 + 1,
                         jnp.bfloat16)
    s_grp = jnp.asarray(rng.standard_normal((REPS, N, G)) * .01 + 1,
                        jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    # numerics: blockdiag == grouped reference (int4 created INSIDE the
    # jit — S4 crossing a jit boundary crashes this toolchain)
    @jax.jit
    def check(x, w8_0, sc, sg):
        w4 = w8_0.astype(jnp.int4)
        ref = grouped(x, w4, sc, sg)
        got = blockdiag(x, w4, sc, sg)
        return (jnp.max(jnp.abs(ref - got)), jnp.max(jnp.abs(ref)))
    err_d, scale_d = check(x, w8[0], s_chan[0], s_grp[0])
    err = float(err_d)
    rel = err / float(scale_d)
    print(f"blockdiag vs grouped: max abs err {err:.3e} (rel {rel:.1e})",
          flush=True)

    nbytes = REPS * K * N / 2                     # int4 view bytes
    for name, fn in VARIANTS.items():
        try:
            loop = make_loop(fn)
            times = {}
            for iters in (4, 24):
                float(loop(x, w8, s_chan, s_grp, iters))   # compile
                t0 = time.perf_counter()
                float(loop(x, w8, s_chan, s_grp, iters))
                times[iters] = time.perf_counter() - t0
            per_iter = (times[24] - times[4]) / 20
            gbps = nbytes / per_iter / 1e9
            print(f"{name:9s}: {per_iter*1e3:8.3f} ms/iter "
                  f"({gbps:6.1f} GB/s int4-byte rate)", flush=True)
        except Exception as e:  # noqa: BLE001 — report per-variant
            print(f"{name:9s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    import sys
    if "--batch-sweep" in sys.argv:
        batch_sweep()
    else:
        main()
