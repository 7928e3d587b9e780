"""Serving-capacity table on the ROUND-5 stack (VERDICT r4 item 4).

The standing aggregate numbers (897 tok/s 16-row spec ceiling, 438
sustained, round 2-3) predate acceptance-adaptive speculation
(default-on), batched admission, the ready park, uint8 media, and the
HBM ledger.  This drives sustained MIXED traffic — half text / half
8-frame-video prompts, alternating greedy and temperature-1.0 sampled
replies — through a continuous-batching pool per config and reports:

  aggregate tok/s | time-to-first-token p50 / p95 | device HBM in use

Mixed traffic is the honest regime for the adaptive controller on
constant perf weights: greedy rows verify at the full-accept ceiling
(extractive-reply analogue) while sampled rows draft near-uniform
logits and adaptively fall back to plain decode (novel-text analogue)
— the aggregate lands between the two, exactly what a deployment sees.

Configs swept (one engine, pools built per config):
  rows x {plain, speculative} at int8+fused+int8KV, bucket 512.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_capacity.py
(VALLEY_CAP_ROWS=8,16,32 VALLEY_CAP_REQS=48 VALLEY_CAP_NEW=96 override)
"""

from __future__ import annotations

import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from valley_tpu import config as C                      # noqa: E402
from valley_tpu.inference import Engine                 # noqa: E402
from valley_tpu.inference.continuous import ContinuousEngine  # noqa: E402
from valley_tpu.models import valley                    # noqa: E402


def hbm_gb(eng=None, pool=None) -> float:
    """Device bytes in use; axon exposes no memory_stats, so fall back
    to the ledger-style analytic sum (weights + pool cache/valid/hist —
    the same byte math serve/hbm.py registers)."""
    try:
        st = jax.local_devices()[0].memory_stats()
        if st and st.get("bytes_in_use"):
            return st["bytes_in_use"] / 2**30
    except Exception:
        pass
    if eng is None:
        return float("nan")
    from valley_tpu.serve import hbm

    total = hbm.tree_bytes(eng.params)
    if pool is not None:
        for attr in ("_cache", "_valid", "_hist"):
            val = getattr(pool, attr, None)
            if val is not None:
                total += hbm.tree_bytes(val)
    return total / 2**30


def build_engine():
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16,
                                     fused=True), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    from valley_tpu.ops.quant import quantize_llama_params

    # VALLEY_CAP_QUANT=int8a8 switches admission prefills (bucket >= 128)
    # to the W8A8 int8-MXU path; decode executables stay identical int8
    params = quantize_llama_params(
        params, act8=os.environ.get("VALLEY_CAP_QUANT") == "int8a8")
    jax.block_until_ready(params)
    eng = Engine(cfg, params, buckets=(128, 512), max_new_tokens=128,
                 cache_dtype=jnp.int8, steps_per_call=16,
                 raw_media=True)
    return cfg, eng


def make_traffic(cfg, n_req: int):
    rng = np.random.default_rng(0)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 8 + [tok.vi_end]
    all_greedy = os.environ.get("VALLEY_CAP_GREEDY") == "1"
    reqs = []
    for i in range(n_req):
        video = i % 2 == 0
        sampled = (i // 2) % 2 == 1 and not all_greedy
        if video:
            n = int(rng.integers(40, 160))
            ids = [1] + span + rng.integers(5, 30000, size=n).tolist()
            media = rng.integers(
                0, 256, (1, 8, 3, cfg.vision.image_size,
                         cfg.vision.image_size)).astype(np.uint8)
        else:
            n = int(rng.integers(40, 100)) if i % 4 == 1 else \
                int(rng.integers(300, 480))
            ids = [1] + rng.integers(5, 30000, size=n).tolist()
            media = None
        reqs.append((ids, media, 1.0 if sampled else 0.0))
    return reqs


def run_config(eng, cfg, rows: int, spec: bool, reqs, new_tokens: int):
    from valley_tpu.inference.continuous import _drain

    kw = {}
    if spec:
        from valley_tpu.inference.speculative import SpecConfig

        kw = dict(speculative=True, spec=SpecConfig(draft_len=8))
    pool = ContinuousEngine(eng, rows=rows, bucket=512,
                            extra_slots=128 + (64 if spec else 0),
                            steps_per_call=4 if spec else 16,
                            admit_batch=4, ready_depth=8, **kw)
    pool.warmup(frames=(8, 0))
    time.sleep(1)
    hbm0 = hbm_gb(eng, pool)

    firsts, counts = {}, {}

    def consume(i, outq, t_submit):
        first = None
        n = 0
        for _ in _drain(outq):
            if first is None:
                first = time.perf_counter() - t_submit
            n += 1
        firsts[i], counts[i] = first, n

    t0 = time.perf_counter()
    threads = []
    for i, (ids, media, temp) in enumerate(reqs):
        outq = pool.submit(ids, images=media, max_new_tokens=new_tokens,
                           eos_id=-1, temperature=temp)
        th = threading.Thread(target=consume, args=(i, outq,
                                                    time.perf_counter()))
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=900)
    dt = time.perf_counter() - t0
    hbm1 = hbm_gb(eng, pool)
    total = sum(counts.values())
    ttft = np.sort(np.asarray([v for v in firsts.values()
                               if v is not None]))
    p50 = float(np.percentile(ttft, 50))
    p95 = float(np.percentile(ttft, 95))
    stats = {k: getattr(pool, k) for k in
             ("spec_rounds", "spec_emitted", "spec_disables")
             if hasattr(pool, k) and getattr(pool, k)}
    if stats.get("spec_rounds"):
        stats["acc_per_round"] = round(
            stats["spec_emitted"] / stats["spec_rounds"] - 1, 2)
    return dict(rows=rows, spec=spec, agg=total / dt, p50=p50, p95=p95,
                hbm_gb=max(hbm0, hbm1), total=total, wall=dt,
                pool_stats=stats)


def main():
    one = os.environ.get("VALLEY_CAP_ONE")
    n_req = int(os.environ.get("VALLEY_CAP_REQS", "48"))
    new_tokens = int(os.environ.get("VALLEY_CAP_NEW", "96"))
    if one:
        # child mode: one (rows, spec) config, then exit — pools have no
        # teardown (daemon scheduler threads own their multi-GB caches),
        # so each config gets a fresh process and a fresh chip
        rows, spec = (int(x) for x in one.split(","))
        cfg, eng = build_engine()
        reqs = make_traffic(cfg, n_req)
        r = run_config(eng, cfg, rows, bool(spec), reqs, new_tokens)
        print(f"rows={r['rows']:3d} spec={int(r['spec'])} | "
              f"agg {r['agg']:7.1f} tok/s | "
              f"TTFT p50 {r['p50']*1e3:6.0f} ms p95 "
              f"{r['p95']*1e3:6.0f} ms | HBM {r['hbm_gb']:.1f} GB | "
              f"{r['total']} tok in {r['wall']:.1f} s "
              f"{r['pool_stats']}", flush=True)
        return

    import subprocess
    import sys as _sys

    rows_list = [int(r) for r in os.environ.get(
        "VALLEY_CAP_ROWS", "16").split(",")]
    spec_modes = [s.strip() for s in os.environ.get(
        "VALLEY_CAP_SPEC", "0,1").split(",")]
    print(f"mixed traffic: {n_req} requests ({n_req//2} video / "
          f"{n_req - n_req//2} text; alternating greedy / temp-1.0), "
          f"{new_tokens}-token replies", flush=True)
    for rows in rows_list:
        for spec in spec_modes:
            env = dict(os.environ, VALLEY_CAP_ONE=f"{rows},{spec}")
            subprocess.run([_sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=2400)
            time.sleep(5)   # let the chip release the child's memory


if __name__ == "__main__":
    main()
