"""int4 decode component ablation (round 5).

The int8 flagship decodes at phys=0.96 of the component model
(streamed_bytes/802 GB/s + 1.48 ms fused fixed), but the 4-bit modes
sit at phys 0.66-0.71 — ~2.1 ms/token (7B int4g) to ~5.6 ms/token
(13B int4gp) above the byte model, even though the isolated blockdiag
GEMV runs at the int4 byte rate (tools/exp_int4_group.py).  Localize
the extra cost inside the full fused decode scan:

  base     — benched 7B int4g decode step (decode_w4 S4 stream, fused)
  packed   — 7B int4gp (nibble-packed storage + per-call unpack)
  nohead   — base without the lm_head matmul
  noattn   — base without the cache attention read
  noview   — int4g WITHOUT the in-executable S4 view: the scan streams
             the int8 STORAGE (1 B/weight) through the identical
             group-scale math — isolates the S4 convert/stream cost
             against a 2x-byte stream (compare ms, not tok/s)
  nogroup  — per-channel int4 (no group scales): isolates the group
             partial-sum reduce
  int8ref  — plain int8 decode, the phys=0.96 anchor, same window
  convertbw— no engine: raw element-throughput of the dequant chain at
             weight scale — jnp.sum(w.astype(bf16)) over a stacked
             S4 tensor vs the same tensor int8 vs pure int8 sum; the
             delta is the VPU convert rate the GEMVs must hide

VALLEY_ABLATE_SIZE=13b runs the 13B equivalents (int4gp storage;
noview is unavailable there — the 1 B/weight tree plus KV does not
fit one chip).  One mode per process (a 16 GB chip cannot hold two
compiled 7B decode arenas).  Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/exp_int4_ablate.py <mode> [n_steps]

MEASURED (round 5, one chip window, 128-step fused calls) — the gap is
RESOLVED, see ROUND_NOTES.md "int4 decode phys gap resolved":

    7b int8ref   10.204 ms/tok   98.0 tok/s   (byte model 10.05 -> phys 0.98)
    7b noview    10.803 ms/tok   92.6 tok/s   (int8-width stream + group
                                               math: model + 0.6 ms group
                                               term -> phys 0.99)
    7b base       8.166 ms/tok  122.5 tok/s   (S4 stream; byte model
                                               predicts 6.36 ms)

noview proves the group-scale math costs only ~0.6 ms/tok at int8
width; the remaining 1.8 ms/tok is the S4 stream itself: 3.44 GB /
(8.17 - 1.48 - 0.6) ms = 565 GB/s physical vs 750 achievable — the VPU
nibble-unpack throttles sub-byte streams to ~70% of the byte rate.
tools/exp_s4_mxu.py confirms it consumer-independently (S4 ~60% of the
int8 physical rate on BOTH the bf16 dequant-dot and the int8-MXU dot:
no XLA dot formulation recovers it).  nogroup's per-channel-int4
executable exceeds a 550 s compile budget on this toolchain and was
not measured; packed/nohead/noattn add nothing once the stream rate is
identified.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import llama

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _perf_quant_params  # noqa: E402  (closed-form quant tree)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def time_engine_decode(eng, params, n, smax=640, plen=472, iters=4):
    cache = llama.init_cache(eng.cfg.text, 1, smax, eng.cache_dtype)
    valid = jnp.arange(smax)[None] < plen
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), plen, jnp.int32)
    key = jax.random.key(0)
    ts = []
    for _ in range(iters + 1):
        c = jax.tree.map(jnp.copy, cache)
        va = jnp.copy(valid)
        sync(c)
        t0 = time.perf_counter()
        out = eng._decode(params, c, va, token, jnp.int32(plen), seq, key,
                          1.0, 1.0, do_sample=False, n_steps=n)
        sync(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


def convertbw():
    """S4 vs int8 weight-stream rate, measured through the GEMV the
    decode path actually runs (tools/exp_s4_mxu.py).  A standalone
    S4 reduce cannot be timed on this toolchain: int4 buffers cannot
    cross jit boundaries (eager ``jnp.full(..., jnp.int4)`` recurses in
    apply_primitive), and an in-jit S4 temp's loop-invariant reduce is
    CSE'd — the GEMV sweep with a per-rep-scaled activation is the
    clean formulation.  Measured round 5: S4 streams at ~60-70% of the
    int8 physical byte rate in EVERY consumer (VPU dequant-dot, int8
    MXU dot), which fully accounts for the 4-bit modes' phys 0.66-0.71
    vs the 802 GB/s byte model."""
    import exp_s4_mxu

    exp_s4_mxu.main()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    size = os.environ.get("VALLEY_ABLATE_SIZE", "7b")
    cfg = (C.valley_7b() if size == "7b" else C.valley_13b()).replace(
        tokens=C.SpecialTokens(im_patch=31996, im_start=31997,
                               im_end=31998, vi_frame=31999,
                               vi_start=31994, vi_end=31995))

    if mode == "convertbw":
        return convertbw()

    import valley_tpu.models.llama as L

    if mode == "nohead":
        L.logits_from_hidden = lambda p, h: (
            h[..., :1].astype(jnp.float32) *
            jnp.zeros((1, cfg.text.vocab_size), jnp.float32))
    elif mode == "noattn":
        L.decode_attention = lambda q, k, v, m, **kw: q

    packed_default = size == "13b"
    qmode = {"packed": "int4gp", "nogroup": "int4",
             "int8ref": "int8"}.get(
        mode, "int4gp" if packed_default else "int4g")
    if mode == "noview" and size == "13b":
        raise SystemExit("noview needs the 1 B/weight tree — 7B only")
    params = _perf_quant_params(cfg, True, qmode)
    jax.block_until_ready(params)

    from valley_tpu.ops.quant import parse_quant_mode

    qm = parse_quant_mode(qmode)
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                 cache_dtype=jnp.int8,
                 decode_w4=(qm["bits"] == 4 and not qm["packed"]
                            and mode != "noview"),
                 w4_packed=qm["packed"],
                 steps_per_call=n)
    t0 = time.perf_counter()
    t = time_engine_decode(eng, params, n)
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(params["llama"]))
    print(f"{size} {mode}: {t*1e3:7.1f} ms / {n} steps = "
          f"{t/n*1e3:.3f} ms/tok, {n/t:6.1f} tok/s  "
          f"(llama resident {wbytes/1e9:.2f} GB; qmode {qmode}; "
          f"compile+sweep {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
