"""Nibble-packed int4 GEMV that crosses jit boundaries safely.

Device-resident S4 arrays crash this toolchain's transfer layer
(exp_int4.py), but int4 compute inside an executable is fast
(exp_int4b.py).  Workaround: store weights bit-packed in an int8 buffer
of HALF size — P[i] packs W[i] (low nibble) and W[i + K/2] (high
nibble) as contiguous row BLOCKS (no interleave) — and unpack inside
the dot:

    y = x_lo @ lo(P) + x_hi @ hi(P)

where lo/hi are elementwise shifts producing int4-valued operands.  If
XLA fuses the unpack into the dot's operand feed, the GEMV streams
int4 bytes while every buffer that crosses the boundary is plain int8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int4c.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def pack_nibbles(w):
    """(K, N) int8 in [-8, 7] -> (K/2, N) packed int8."""
    k = w.shape[0]
    lo = w[: k // 2] & 0xF
    hi = (w[k // 2:] & 0xF) << 4
    return (lo | hi).astype(np.int8)


def main():
    k, n, reps = 4096, 11008, 8
    rng = np.random.default_rng(0)
    w_np = rng.integers(-8, 8, (reps, k, n)).astype(np.int8)
    packed = np.stack([pack_nibbles(w_np[i]) for i in range(reps)])
    w8 = jnp.asarray(w_np)                       # int8 reference
    wp = jnp.asarray(packed)                     # (reps, K/2, N) int8
    scale = jnp.asarray(rng.standard_normal((reps, n)) * 0.01,
                        jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_i8(x, w, s, iters):
        def body(x_c, _):
            def inner(ci, args):
                wi, si = args
                y = (x_c @ wi.astype(jnp.bfloat16)) * si
                return ci + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(inner, 0.0, (w, s))
            return x_c * (1.0 + 1e-12 * acc).astype(jnp.bfloat16), acc
        x_f, accs = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(accs) + jnp.sum(x_f.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_packed(x, wp, s, iters):
        half = wp.shape[1]

        def body(x_c, _):
            x_lo = x_c[:, :half]
            x_hi = x_c[:, half:]

            def inner(ci, args):
                pi, si = args
                # low nibble: sign-extend via <<4 then arithmetic >>4
                lo = ((pi << 4).astype(jnp.int8) >> 4).astype(jnp.int4)
                hi = (pi >> 4).astype(jnp.int4)
                y = (x_lo @ lo.astype(jnp.bfloat16)
                     + x_hi @ hi.astype(jnp.bfloat16)) * si
                return ci + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(inner, 0.0, (wp, s))
            return x_c * (1.0 + 1e-12 * acc).astype(jnp.bfloat16), acc
        x_f, accs = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(accs) + jnp.sum(x_f.astype(jnp.float32))

    # correctness first (single pass equivalence)
    a = float(loop_i8(x, w8, scale, 1))
    b = float(loop_packed(x, wp, scale, 1))
    print(f"checksum int8 {a:.2f} vs packed-int4 {b:.2f} "
          f"(diff {abs(a - b):.4f})", flush=True)

    nbytes = reps * k * n
    for name, fn, args, stored in (
            ("int8", loop_i8, (x, w8, scale), nbytes),
            ("packed-int4", loop_packed, (x, wp, scale), nbytes / 2)):
        times = {}
        for iters in (4, 24):
            out = float(fn(*args, iters))
            t0 = time.perf_counter()
            out = float(fn(*args, iters))
            times[iters] = time.perf_counter() - t0
        per_iter = (times[24] - times[4]) / 20
        print(f"{name}: {per_iter * 1e3:.2f} ms/iter = "
              f"{stored / per_iter / 1e9:.0f} GB/s stored, "
              f"{2 * nbytes / per_iter / 1e9:.0f} GB/s bf16-equivalent",
              flush=True)


if __name__ == "__main__":
    main()
