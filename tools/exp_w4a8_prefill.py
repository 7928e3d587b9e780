"""Can GROUPED int4 prefill ride the v5e int8 MXU (W4A8)?

13B-on-one-chip serves int4gp (group-128 scales, nibble-packed), and its
prefill currently dequantizes int4 -> bf16 and runs the grouped einsum at
the bf16 MXU rate — so video->first-token at 13B (0.379 s, ROUND_NOTES
round 5) pays ~2x the GEMM time the int8 MXU path would.  int4 values
expand to int8 EXACTLY, so a W4A8 formulation is available: quantize
activations per (token, group) to int8, run one batched int8 dot per
group (g as the dot_general batch dim, int32 accumulate), rescale by
(activation scale x weight group scale) in fp32 and sum over groups.

Measures, at the grouped GEMM shapes of both model sizes (S=512 bucket,
group=128):

  g_bf16   : grouped einsum over dequantized bf16 weights [today's path]
  g_w4a8   : per-(token,group) int8 act quant + batched int8 dot
  g_w4a8t  : same but per-token (row) act scales (cheaper quant, one
             scale per token — measures whether the finer scales cost)
  w8a8     : plain per-channel W8A8 (no groups) [the int8a8 prefill path,
             upper bound for the MXU rate at these shapes]

Each variant runs ITERS dependent GEMM chains inside ONE jit (axon
dispatch ~25-40 ms; chains prevent DCE/CSE), timed by forced transfer.

Run on the real chip: python tools/exp_w4a8_prefill.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 128
S = 512
GS = 128          # group size (the int4g/int4gp serving value)
MODELS = {
    "7b": [  # (name, K, N)
        ("wqkv", 4096, 3 * 4096),
        ("wo", 4096, 4096),
        ("w_gateup", 4096, 2 * 11008),
        ("w_down", 11008, 4096),
    ],
    "13b": [
        ("wqkv", 5120, 3 * 5120),
        ("wo", 5120, 5120),
        ("w_gateup", 5120, 2 * 13824),
        ("w_down", 13824, 5120),
    ],
}


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
    n = y.shape[1]
    if n >= k:
        return y[:, :k]
    reps = -(-k // n)
    return jnp.concatenate([y] * reps, axis=1)[:, :k]


def chain_g_bf16(x, wq, ws):
    """Today's int4g prefill: grouped dequant einsum in bf16
    (llama._proj's b*g >= 128 branch)."""
    o, g = ws.shape
    k = x.shape[1]
    gs = k // g

    def body(h, _):
        wg = wq.reshape(o, g, gs).astype(jnp.bfloat16)
        xg = h.reshape(h.shape[0], g, gs)
        part = jnp.einsum("tgi,ogi->tog", xg, wg,
                          preferred_element_type=jnp.float32)
        y = jnp.sum(part * ws[None].astype(jnp.float32), axis=-1)
        return _fit(y, k).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_g_w4a8(x, wq, ws):
    """Candidate: per-(token, group) int8 activation quant + batched
    int8 dot (g batch dim), int32 accumulate, fp32 rescale + group sum."""
    o, g = ws.shape
    k = x.shape[1]
    gs = k // g

    def body(h, _):
        t = h.shape[0]
        xg = h.reshape(t, g, gs).astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1), 1e-6) / 127.0
        xq = jnp.round(xg / a[..., None]).astype(jnp.int8)
        part = jnp.einsum("tgi,ogi->tog", xq, wq.reshape(o, g, gs),
                          preferred_element_type=jnp.int32)
        y = jnp.sum(part.astype(jnp.float32)
                    * a[:, None, :]
                    * ws[None].astype(jnp.float32), axis=-1)
        return _fit(y, k).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_g_w4a8t(x, wq, ws):
    """Same dot, per-token (whole-row) activation scales."""
    o, g = ws.shape
    k = x.shape[1]
    gs = k // g

    def body(h, _):
        t = h.shape[0]
        hf = h.astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True),
                        1e-6) / 127.0
        xq = jnp.round(hf / a).astype(jnp.int8).reshape(t, g, gs)
        part = jnp.einsum("tgi,ogi->tog", xq, wq.reshape(o, g, gs),
                          preferred_element_type=jnp.int32)
        y = jnp.sum(part.astype(jnp.float32)
                    * ws[None].astype(jnp.float32), axis=-1) * a
        return _fit(y, k).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def chain_w8a8(x, wq, ws_pc):
    """Plain per-channel W8A8 (the int8a8 path) — MXU-rate upper bound."""
    def body(h, _):
        a = jnp.maximum(jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1,
                                keepdims=True), 1e-6) / 127.0
        hq = jnp.round(h.astype(jnp.float32) / a).astype(jnp.int8)
        y = jax.lax.dot_general(hq, wq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * a * ws_pc[None, :]
        return _fit(y, x.shape[1]).astype(jnp.bfloat16) + x, None

    h, _ = jax.lax.scan(body, x, None, length=ITERS)
    return h


def main():
    print(f"backend={jax.default_backend()}  S={S}  iters={ITERS}  "
          f"group={GS}")
    rng = np.random.default_rng(0)
    for model, shapes in MODELS.items():
        print(f"\n== {model} ==")
        means = {}
        for name, k, n in shapes:
            x = jnp.asarray(rng.standard_normal((S, k)), jnp.bfloat16)
            # int4-range weights, (out, in) storage like the repo
            wq = jnp.asarray(rng.integers(-7, 8, (n, k)), jnp.int8)
            g = k // GS
            ws = jnp.asarray(
                0.02 + 0.01 * rng.standard_normal((n, g)).astype(
                    np.float32) ** 2, jnp.bfloat16)       # (out, K/GS)
            ws_pc = jnp.asarray(np.full((n,), 0.02), jnp.float32)
            flops = 2.0 * S * k * n * ITERS
            res = {}
            for label, fn, args in [
                ("g_bf16", jax.jit(chain_g_bf16), (x, wq, ws)),
                ("g_w4a8", jax.jit(chain_g_w4a8), (x, wq, ws)),
                ("g_w4a8t", jax.jit(chain_g_w4a8t), (x, wq, ws)),
                ("w8a8", jax.jit(chain_w8a8), (x, wq, ws_pc)),
            ]:
                dt = _time(fn, *args)
                res[label] = flops / dt / 1e12
                means.setdefault(label, []).append(res[label])
            print(f"{name:10s} ({k:6d}x{n:6d}): " + "  ".join(
                f"{lb}={v:7.1f} TF/s" for lb, v in res.items()))
        m = {lb: sum(v) / len(v) for lb, v in means.items()}
        print(f"mean: " + "  ".join(f"{lb}={v:.1f}" for lb, v in m.items())
              + f"  | g_w4a8/g_bf16 = {m['g_w4a8'] / m['g_bf16']:.2f}x")


if __name__ == "__main__":
    main()
