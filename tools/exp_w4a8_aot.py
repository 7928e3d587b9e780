"""Why does 13B int4gpa8 prefill regress (and once crash) on chip?

Round-5 on-chip A/B: 13B int4gp video first-token 0.379/0.383 s across
two windows; int4gpa8 measured 0.414 s once and CRASHED the TPU worker
("TPU worker process crashed or restarted") mid-warmup on the repeat —
suspected HBM pressure: the grouped W4A8 prefill (`llama._w4a8_group_dot`)
feeds an int8 dot, and dot OPERANDS cannot stay fused into the nibble
unpack the way the bf16 grouped-einsum path's dequant convert can, so
the unpacked int8 weights (plus the (tokens, out, groups) int32 partial
tensor, if XLA materializes it) live as executable temps on top of the
~7 GiB resident weights + KV + vision.

This measures the question exactly: AOT-compile the REAL 13B single-chip
prefill executable (8-frame uint8 video, bucket 512, fused layout,
int8 KV — the bench/worker config) for int4gp vs int4gpa8 against a
device-less v5e topology and read XLA's buffer assignment, the same
method as tools/exp_13b_aot.py.  No chip time needed.

Usage: python tools/exp_w4a8_aot.py [bucket]

Result (recorded 2026-08-19, this toolchain): the two modes compile to
IDENTICAL buffer assignments — arguments 7.57 GB, temps 8.66 GB, total
16.87 GB of the 17.18 GB (16 GiB) physical HBM, i.e. ~0.3 GB spare.
Two conclusions:

1. The a8 path adds NO measurable executable memory: the peak temp is
   the shared nibble-unpack view (+ activation buffers under it), so
   the 0.414 s vs 0.379 s e2e regression is a COMPUTE effect (the
   per-token activation quant + grouped int8 dot at 40-layer 13B
   shapes does not beat the bf16 grouped einsum once the unpack is in
   the executable — the microbench's 1.25x used pre-unpacked int8
   operands), not an OOM effect.
2. BOTH 13B packed prefills are marginal on the chip (~98% of HBM at
   XLA's own accounting; the worker ledger's 2 GiB reserved headroom
   is what absorbs the 2 GiB of temps beyond the ledgered unpack
   entry).  The observed one-off TPU worker crash during an int4gpa8
   warmup is consistent with that marginality, not with a mode-specific
   leak.

Serving guidance recorded in docs/SERVING.md: int4gp stays the
recommended one-chip 13B mode; int4gpa8's grouped W4A8 prefill is a
measured e2e win only at 7B (0.196 s vs int4g's 0.204 s same-window)
where unpacking is not in the path (int4ga8 = int8-stored).
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
from valley_tpu.models import valley
from valley_tpu.ops.quant import (pack_int4_params, parse_quant_mode,
                                  quantize_llama_params)
from valley_tpu.parallel.mesh import AXES

HBM_PER_CHIP = 16 * 1024**3          # v5e: 16 GiB physical


def qshape_tree(cfg, qmode: str):
    """Quantized param SHAPES via eval_shape over the real quantizer —
    layout-exact for every mode (scales, a8 keys, nibble packing).
    Packing is mirrored shape-wise (pack_int4_params range-checks
    eagerly, so it cannot run under eval_shape): contraction axis
    halved to uint8 — last for the (out, in) layers, first for the
    (in, out) lm_head, exactly `_pack_nibbles`' layout."""
    from valley_tpu.ops.quant import QUANT_TARGETS

    qm = parse_quant_mode(qmode)

    def build(k):
        p = valley.init_params(cfg, k, dtype=jnp.bfloat16, fused=True)
        return quantize_llama_params(p, bits=qm["bits"],
                                     group_size=qm["group_size"],
                                     act8=qm["act8"])

    shapes = jax.eval_shape(build, jax.random.key(0))
    if not qm["packed"]:
        return shapes
    shapes = dict(shapes)
    llama_p = dict(shapes["llama"])
    layers = dict(llama_p["layers"])
    for name in QUANT_TARGETS:
        if name in layers and layers[name].dtype == jnp.int8:
            s = layers[name].shape
            layers[name] = jax.ShapeDtypeStruct(
                s[:-1] + (s[-1] // 2,), jnp.uint8)
    llama_p["layers"] = layers
    head = llama_p.get("lm_head")
    if head is not None and head.dtype == jnp.int8:
        llama_p["lm_head"] = jax.ShapeDtypeStruct(
            (head.shape[0] // 2, head.shape[1]), jnp.uint8)
    shapes["llama"] = llama_p
    return shapes


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    max_new = 1024
    cfg = C.valley_13b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    mesh = Mesh(np.array(topo.devices[:1]).reshape(1, 1, 1), AXES)
    rep = NamedSharding(mesh, P())

    def r(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)

    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    key_arg = jax.ShapeDtypeStruct(key_aval.shape, key_aval.dtype,
                                   sharding=rep)
    frames, v = 8, cfg.vision
    smax = bucket + max_new

    for qmode in ("int4gp", "int4gpa8"):
        params = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=rep),
            qshape_tree(cfg, qmode))

        eng = Engine.__new__(Engine)   # no device work: lower only
        eng.cfg = cfg
        eng.mesh = None
        eng.decode_w4 = False
        eng.w4_packed = True
        eng.decode_unroll = 1
        eng.decode_kernel = False
        eng.cache_dtype = jnp.int8
        eng.use_flash = False

        pre = jax.jit(
            eng._prefill_impl,
            static_argnames=("bucket", "cache_len", "do_sample",
                             "has_images")).lower(
            params, r((1, bucket), jnp.int32),
            r((1, frames, 3, v.image_size, v.image_size), jnp.uint8),
            r((1,), jnp.int32), key_arg, r((), jnp.float32),
            r((), jnp.float32), None, bucket=bucket, cache_len=smax,
            do_sample=False, has_images=True).compile()
        ma = pre.memory_analysis()
        arg, tmp, out = (ma.argument_size_in_bytes, ma.temp_size_in_bytes,
                         ma.output_size_in_bytes)
        total = arg + tmp + out
        print(f"13B {qmode:9s} prefill (8-frame uint8 video, bucket "
              f"{bucket}, smax {smax}):")
        print(f"  argument bytes: {arg/1e9:7.2f} GB")
        print(f"  temp bytes    : {tmp/1e9:7.2f} GB")
        print(f"  output bytes  : {out/1e9:7.2f} GB")
        frac = total / HBM_PER_CHIP
        print(f"  total         : {total/1e9:7.2f} GB of "
              f"{HBM_PER_CHIP/1e9:.2f} GB physical -> {frac:.0%} "
              f"({'MARGINAL' if frac > 0.9 else 'fits'})",
              flush=True)


if __name__ == "__main__":
    main()
