"""13B TP serving proof at the largest scale available (VERDICT r2 item 5).

Real multi-chip hardware is unavailable (one v5e behind the tunnel), so
this validates the 13B tensor-parallel serving path by AOT-compiling the
REAL decode executable against a device-less v5e multi-chip topology
(`jax.experimental.topologies`) and reading XLA's buffer assignment:
per-shard argument/temp bytes must fit the 16 GB chip.  This checks the
actual SPMD partitioning the engine would run — stronger than an
analytic table (XLA sees every buffer) — while token-identity of the TP
engine is separately proven on the virtual CPU mesh
(tests/test_sharded_inference.py).

Parity target: the reference needs >=30 GB VRAM or multi-GPU
`device_map` sharding for 13B (`valley/serve/model_worker.py:55-58`,
README.md:91).

Usage: python tools/exp_13b_aot.py [tp] [bucket] (no chip time needed)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from valley_tpu import config as C
from valley_tpu.inference.engine import Engine
from valley_tpu.models import llama, valley
from valley_tpu.ops.quant import QUANT_TARGETS
from valley_tpu.parallel.mesh import AXES
from valley_tpu.parallel.sharding import (kv_cache_sharding,
                                          param_shardings)

HBM_PER_CHIP = 16e9


def quantized_shape_tree(cfg):
    """int8-quantized 13B param SHAPES (no weights materialize —
    mirrors ops.quant.quantize_llama_params' layout)."""
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    shapes = jax.tree.map(lambda s: s, shapes)  # shallow copy leaves
    lay = dict(shapes["llama"]["layers"])
    for name in QUANT_TARGETS:
        if name in lay:
            s = lay[name]
            lay[name] = jax.ShapeDtypeStruct(s.shape, jnp.int8)
            lay[name + "_scale"] = jax.ShapeDtypeStruct(
                s.shape[:-1], jnp.bfloat16)
    llama_p = dict(shapes["llama"])
    llama_p["layers"] = lay
    head = llama_p["lm_head"]
    llama_p["lm_head"] = jax.ShapeDtypeStruct(head.shape, jnp.int8)
    llama_p["lm_head_scale"] = jax.ShapeDtypeStruct(
        (1, head.shape[-1]), jnp.bfloat16)
    shapes = dict(shapes)
    shapes["llama"] = llama_p
    return shapes


def with_shardings(shapes, shardings):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings)


def main():
    tp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    max_new = 1024
    cfg = C.valley_13b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    tc = cfg.text

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    devs = np.array(topo.devices[:tp]).reshape(1, 1, tp)
    mesh = Mesh(devs, AXES)   # data=1, fsdp=1, model=tp

    params = quantized_shape_tree(cfg)
    pshard = param_shardings(mesh, params)
    params = with_shardings(params, pshard)

    smax = bucket + max_new
    cache_shapes = jax.eval_shape(
        lambda: llama.init_cache(tc, 1, smax, jnp.int8))
    cache = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=kv_cache_sharding(mesh, 1, tc.kv_heads,
                                       ndim=len(s.shape))),
        cache_shapes)
    rep = NamedSharding(mesh, P())

    def r(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)

    eng = Engine.__new__(Engine)   # no device work: lower only
    eng.cfg = cfg
    eng.mesh = None
    eng.decode_w4 = False
    eng.decode_unroll = 1
    eng.decode_kernel = False
    eng.cache_dtype = jnp.int8
    eng.use_flash = False

    n_steps = 127
    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    key_arg = jax.ShapeDtypeStruct(key_aval.shape, key_aval.dtype,
                                   sharding=rep)
    lowered = jax.jit(
        eng._decode_impl, static_argnames=("do_sample", "n_steps"),
        donate_argnames=("cache", "valid")).lower(
        params, cache, r((1, smax), jnp.bool_), r((1,), jnp.int32),
        r((), jnp.int32), r((1,), jnp.int32), key_arg,
        r((), jnp.float32), r((), jnp.float32),
        do_sample=False, n_steps=n_steps)
    def report(tag, compiled):
        ma = compiled.memory_analysis()
        arg = ma.argument_size_in_bytes
        tmp = ma.temp_size_in_bytes
        out = ma.output_size_in_bytes
        alias = ma.alias_size_in_bytes   # donation aliases cache in/out
        total = arg + tmp + out
        print(f"{tag}:")
        print(f"  per-chip argument bytes: {arg/1e9:7.2f} GB")
        print(f"  per-chip temp bytes    : {tmp/1e9:7.2f} GB")
        print(f"  per-chip output bytes  : {out/1e9:7.2f} GB "
              f"(aliased {alias/1e9:.2f})")
        print(f"  per-chip total         : {total/1e9:7.2f} GB of "
              f"{HBM_PER_CHIP/1e9:.0f} GB -> "
              f"{'FITS' if total < 0.9 * HBM_PER_CHIP else 'DOES NOT FIT'}",
              flush=True)

    report(f"13B int8 TP={tp} fused {n_steps}-step decode, bucket "
           f"{bucket}, smax {smax}", lowered.compile())

    # pooled (continuous-batching) decode at TP: the 13B multi-chip
    # aggregate-serving config (--tensor-parallel N --batch-window-ms -1)
    from valley_tpu.inference.continuous import ContinuousEngine

    rows = 4
    pool = ContinuousEngine.__new__(ContinuousEngine)
    pool.engine = eng
    pool._spec = None
    pool_cache = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=kv_cache_sharding(mesh, rows, tc.kv_heads,
                                       ndim=len(s.shape))),
        jax.eval_shape(lambda: llama.init_cache(tc, rows, smax,
                                                jnp.int8)))
    pool_lowered = jax.jit(
        pool._decode_impl, static_argnames=("n_steps",),
        donate_argnames=("cache", "valid")).lower(
        params, pool_cache, r((rows, smax), jnp.bool_),
        r((rows,), jnp.int32), r((rows,), jnp.int32),
        r((rows,), jnp.int32), key_arg, r((rows,), jnp.float32),
        r((rows,), jnp.float32), n_steps=16)
    report(f"13B int8 TP={tp} pooled decode ({rows} rows, smax {smax})",
           pool_lowered.compile())

    # prefill is where the single-chip 13B OOMed in round 2 — check it
    # too (8-frame video, vision tower + 512-token LLM prefill)
    frames = 8
    v = cfg.vision
    pre = jax.jit(
        eng._prefill_impl,
        static_argnames=("bucket", "cache_len", "do_sample",
                         "has_images")).lower(
        params, r((1, bucket), jnp.int32),
        r((1, frames, 3, v.image_size, v.image_size), jnp.bfloat16),
        r((1,), jnp.int32), key_arg, r((), jnp.float32),
        r((), jnp.float32), None, bucket=bucket, cache_len=smax,
        do_sample=False, has_images=True)
    report(f"13B int8 TP={tp} prefill (8-frame video, bucket {bucket})",
           pre.compile())


if __name__ == "__main__":
    main()
