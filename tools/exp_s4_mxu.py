"""Can anything stream S4 weights faster than the VPU dequant-dot?

Round-5 ablation (tools/exp_int4_ablate.py) localized the int4g decode
phys gap: an identical-math executable streaming int8-width weights
(noview, 10.80 ms/tok) matches the byte model to 1%, while the S4-view
stream (base, 8.17 ms/tok) runs ~1.8 ms/tok above its byte model — the
S4 read+convert sustains only ~565 GB/s of physical bytes vs the 750
GB/s measured achievable (tools/exp_calib2.py).  The convert is fused
into the dequant-dot (`w4.astype(bf16)`), so the VPU nibble-unpack is
the suspected stall.

This micro times the SAME stacked GEMV weight pass four ways, at the
fused-decode shape (L layers scanned, W (O, K) per layer, x (K, B)
with B = 32 partial columns — the b*g block-diag width `llama._proj`
uses at group 128):

  bf16dot  — current path: dot(w4.astype(bf16), x_bf16)      [VPU]
  s4mxu    — dot_general(x_s8, w4, preferred int32): int8 MXU
             consuming the S4 operand directly (does the MXU's int
             pipeline unpack nibbles at byte rate?)
  s8mxu    — dot_general(x_s8, w8, preferred int32) on the SAME
             logical weights stored int8 (1 B/weight): the byte-rate
             MXU anchor at 2x the bytes
  s8dot    — dot(w8.astype(bf16), x_bf16): the int8 VPU dequant-dot
             anchor (the int8 flagship's formulation)

All variants create the S4 view INSIDE the executable (int4 cannot
cross jit boundaries) and amortize it over a fori_loop of GEMV passes
whose accumulator depends on the loop index (defeats CSE), so the
reported per-pass time is the steady-state weight-stream rate, not the
one-time view materialization.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/exp_s4_mxu.py [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, O, K, B = 8, 22016, 4096, 32          # w_gateup fused-decode shape
REPS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 32


def timeit(fn, *args, iters=5):
    ts = []
    for _ in range(iters + 1):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


def main():
    w8 = jnp.full((L, O, K), 7, jnp.int8)
    xb = jnp.full((K, B), 0.01, jnp.bfloat16)
    xq = jnp.full((K, B), 3, jnp.int8)
    jax.block_until_ready((w8, xb, xq))
    n_bytes8 = L * O * K            # int8 storage bytes
    n_bytes4 = n_bytes8 // 2        # S4 view bytes

    def sweep(wstack, x, per_layer, scale_x):
        # lax.scan over the stacked layer axis — the engine's access
        # pattern (no dynamic-slice copies).  The rep loop scales x by
        # (i+1) so the weight pass cannot be CSE'd across reps.
        def rep(acc, i):
            xi = scale_x(x, i)

            def layer(a, w):
                return a + per_layer(w, xi), None

            acc2, _ = jax.lax.scan(layer, acc, wstack)
            return acc2, None

        acc, _ = jax.lax.scan(rep, jnp.float32(0), jnp.arange(REPS))
        return acc

    scale_f = lambda x, i: x * (i + 1).astype(x.dtype)
    scale_i = lambda x, i: x + (i % 2).astype(x.dtype)

    @jax.jit
    def bf16dot(w8, x):
        w4 = w8.astype(jnp.int4)
        return sweep(w4, x, lambda w, xi: jnp.sum(
            jax.lax.dot_general(w.astype(jnp.bfloat16), xi,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)),
            scale_f)

    @jax.jit
    def s4mxu(w8, x):
        w4 = w8.astype(jnp.int4)
        return sweep(w4, x, lambda w, xi: jnp.sum(
            jax.lax.dot_general(w, xi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            .astype(jnp.float32)), scale_i)

    @jax.jit
    def s8mxu(w8, x):
        return sweep(w8, x, lambda w, xi: jnp.sum(
            jax.lax.dot_general(w, xi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            .astype(jnp.float32)), scale_i)

    @jax.jit
    def s8dot(w8, x):
        return sweep(w8, x, lambda w, xi: jnp.sum(
            jax.lax.dot_general(w.astype(jnp.bfloat16), xi,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)),
            scale_f)

    cases = [("bf16dot (current S4 path)", bf16dot, xb, n_bytes4),
             ("s4mxu   (S4 on int8 MXU)", s4mxu, xq, n_bytes4),
             ("s8mxu   (int8 MXU anchor)", s8mxu, xq, n_bytes8),
             ("s8dot   (int8 VPU anchor)", s8dot, xb, n_bytes8)]
    for name, fn, x, nb in cases:
        try:
            t = timeit(fn, w8, x)
        except Exception as e:  # a variant may not lower on this toolchain
            print(f"  {name:28s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:90]})", flush=True)
            continue
        per_pass = t / REPS
        print(f"  {name:28s}: {per_pass*1e3:7.2f} ms/pass  "
              f"{nb/per_pass/1e9:6.1f} GB/s (physical)  "
              f"{n_bytes8/per_pass/1e9:6.1f} GB/s (int8-equiv)",
              flush=True)


if __name__ == "__main__":
    main()
