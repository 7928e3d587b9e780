"""Does the v5e int8 MXU path pay off for PREFILL GEMMs?

Prefill is compute-bound (77% device MFU at the 512 bucket,
tools/exp_prefill_mfu.py), and the v5e MXU is spec'd at 394 int8 TOPS
vs 197 bf16 TFLOP/s — so W8A8 (int8 weights x dynamically-quantized
int8 activations, int32 accumulate) could in principle ~2x the LLM
prefill that dominates video->first-token latency.  Decode is
bandwidth-bound and gains nothing (tools/exp_int8_gemv.py measured
identical GEMV rates) — this is strictly a batched-shape question.

Measures, at the 7B layer GEMM shapes (bucket 512):

  bf16    : x(bf16) @ w(bf16)                      [today's prefill]
  w8a16   : x(bf16) @ dequant(w int8)              [today's int8 mode]
  w8a8    : quant(x) @ w(int8) -> int32, rescale   [the candidate]
  w8a8raw : int8 @ int8 -> int32 only              [MXU ceiling probe]

Each variant runs ITERS dependent GEMM chains inside ONE jit (axon
dispatch ~25 ms; chains prevent DCE/CSE), timed by forced transfer.

Run on the real chip: python tools/exp_w8a8_prefill.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 256   # big enough that the ~25-40 ms dispatch floor is <5%
S = 512             # prefill bucket
SHAPES = [          # 7B layer GEMMs: (K, N)
    ("wqkv", 4096, 4096 + 2 * 4096 // 8 if False else 3 * 4096),
    ("wo", 4096, 4096),
    ("w_gateup", 4096, 2 * 11008),
    ("w_down", 11008, 4096),
]


def _time(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))          # compile + sync
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def _fit(y, k):
    """Map a (S, N) GEMM output back to (S, k) for the chain residual."""
    n = y.shape[1]
    if n >= k:
        return y[:, :k]
    reps = -(-k // n)
    return jnp.concatenate([y] * reps, axis=1)[:, :k]


def chain_bf16(x, w):
    def body(h, _):
        y = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return _fit(y, x.shape[1]).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_w8a16(x, wq, ws):
    def body(h, _):
        y = jax.lax.dot_general(h, wq.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y * ws[None, :]
        return _fit(y, x.shape[1]).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_w8a8(x, wq, ws):
    def body(h, _):
        a = jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0
        hq = jnp.round(h / a).astype(jnp.int8)
        y = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * a * ws[None, :]
        return _fit(y, x.shape[1]).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_w8a8raw(xq, wq):
    def body(h, _):
        y = jax.lax.dot_general(h, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (_fit(y, xq.shape[1]) & 127).astype(jnp.int8), None

    h, _ = jax.lax.scan(body, xq, None, length=ITERS)
    return h


def chain_w8a8_oi(x, wq_oi, ws):
    """W8A8 with the weight stored (out, in) — the repo's torch-Linear
    storage (llama.init_params) — contracting dim 1 of both operands.
    Verifies XLA doesn't materialize a transposed int8 copy (the round-2
    bf16 lesson at batch > 1)."""
    def body(h, _):
        a = jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0
        hq = jnp.round(h / a).astype(jnp.int8)
        y = jax.lax.dot_general(hq, wq_oi, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * a * ws[None, :]
        return _fit(y, x.shape[1]).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def main():
    print(f"backend={jax.default_backend()}  S={S}  iters={ITERS}")
    rng = np.random.default_rng(0)
    rows = []
    for name, k, n in SHAPES:
        x = jnp.asarray(rng.standard_normal((S, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        ws = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        wq = jnp.round(w.astype(jnp.float32) / ws[None, :]).astype(jnp.int8)
        xq = jnp.round(x.astype(jnp.float32)).astype(jnp.int8)
        flops = 2.0 * S * k * n * ITERS
        res = {}
        for label, fn, args in [
            ("bf16", jax.jit(chain_bf16), (x, w)),
            ("w8a16", jax.jit(chain_w8a16), (x, wq, ws)),
            ("w8a8", jax.jit(chain_w8a8), (x, wq, ws)),
            ("w8a8oi", jax.jit(chain_w8a8_oi), (x, wq.T.copy(), ws)),
            ("w8a8raw", jax.jit(chain_w8a8raw), (xq, wq)),
        ]:
            dt = _time(fn, *args)
            res[label] = flops / dt / 1e12
        rows.append((name, k, n, res))
        print(f"{name:10s} ({k:6d}x{n:6d}): " + "  ".join(
            f"{lb}={v:7.1f} TF/s" for lb, v in res.items()))
    bf = sum(r[3]["bf16"] for r in rows) / len(rows)
    w8 = sum(r[3]["w8a8"] for r in rows) / len(rows)
    print(f"\nmean bf16 {bf:.1f} TF/s | mean w8a8 {w8:.1f} TF/s "
          f"({w8 / bf:.2f}x)  [v5e spec: bf16 197, int8 394]")

    # token-count sweep on the two big GEMMs: where does a8 stop paying?
    print("\ntoken sweep (w_gateup + w_down chain):")
    for s in (64, 128, 256, 512):
        x = jnp.asarray(rng.standard_normal((s, 4096)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((4096, 22016)) * 0.02,
                         jnp.bfloat16)
        w1s = jnp.max(jnp.abs(w1.astype(jnp.float32)), axis=0) / 127.0
        w1q = jnp.round(w1.astype(jnp.float32) / w1s[None, :]
                        ).astype(jnp.int8)
        flops = 2.0 * s * 4096 * 22016 * ITERS
        t_bf = _time(jax.jit(chain_bf16), x, w1)
        t_a8 = _time(jax.jit(chain_w8a8_oi), x, w1q.T.copy(), w1s)
        print(f"  S={s:4d}: bf16 {flops / t_bf / 1e12:7.1f} TF/s | "
              f"w8a8(oi) {flops / t_a8 / 1e12:7.1f} TF/s "
              f"({t_bf / t_a8:.2f}x)")


if __name__ == "__main__":
    main()
