"""HBM-ledger admission proof for the 13B one-chip config (VERDICT r4
item 3): reproduces exactly the fixed registrations a
``--quantize int4gp --kv-cache int8`` 13B worker makes at startup
(model_worker.__init__ ledger block) against the v5e default budget
(16 GiB − 2 GiB headroom) and prints the snapshot + verdict.

Runs host-side on CPU jax (the byte math is shape-derived; the packed
13B tree is ~6.4 GB of host RAM).

Round-5 measured companion: VALLEY_BENCH_SIZE=13b bench.py ran this
config on the real chip — 65.8 tok/s decode, 0.379 s video
first-token (ROUND_NOTES round 5).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/exp_13b_hbm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from valley_tpu import config as C
    from valley_tpu.ops.quant import QUANT_TARGETS
    from valley_tpu.serve import hbm

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cfg = C.valley_13b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998,
        vi_frame=31999, vi_start=31994, vi_end=31995))
    params = bench._perf_quant_params(cfg, fused=True, qmode="int4gp")

    V5E_HBM = 16 * hbm.GiB
    total = V5E_HBM - max(2 * hbm.GiB, int(0.10 * V5E_HBM))
    budget = hbm.HbmBudget(total)

    budget.register_fixed("weights", hbm.tree_bytes(params))
    lay = params["llama"]["layers"]
    unpack = sum(lay[k].nbytes for k in QUANT_TARGETS
                 if k in lay and lay[k].dtype == jnp.uint8)
    unpack += params["llama"]["lm_head"].nbytes
    budget.register_fixed("w4_unpack_temp", unpack)

    # plain-path worst case at the bench geometry: bucket 512,
    # max_new 256, 512-slot prefix-spawn class, steps_per_call slack
    slot = hbm.kv_slot_bytes(cfg.text, jnp.int8)
    slots = 512 + 256 + 512 + 32

    print(f"v5e budget: {total / hbm.GiB:.2f} GiB "
          f"(16 GiB − 2 GiB headroom)")
    print(f"  weights (packed int4g)  "
          f"{hbm.tree_bytes(params) / hbm.GiB:7.2f} GiB")
    print(f"  w4 unpack executable temp {unpack / hbm.GiB:5.2f} GiB")
    print(f"  per-request in-flight KV  "
          f"{slots * slot / hbm.GiB:5.2f} GiB")

    # the worker DEFAULT (--limit-model-concurrency 5) must be REJECTED
    # at startup — 5 concurrent 13B plain-path requests over-commit the
    # chip; the ledger turns a mid-traffic OOM into a config error:
    try:
        budget.register_fixed("inflight", 5 * slots * slot)
        print("UNEXPECTED: concurrency-5 config admitted")
        return 1
    except hbm.BudgetExceeded as e:
        print(f"concurrency 5: REJECTED at startup ({e})")

    # the recommended one-chip 13B config: single-stream latency serving
    budget.register_fixed("inflight", 1 * slots * slot)
    print(f"concurrency 1: ADMITTED with "
          f"{budget.free() / hbm.GiB:.2f} GiB free for sessions / "
          f"prefix fragments  -> worker flags: --quantize int4gp "
          f"--kv-cache int8 --fused --limit-model-concurrency 1")
    return 0


if __name__ == "__main__":
    main()
