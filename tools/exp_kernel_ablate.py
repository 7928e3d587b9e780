"""Ablate the fused decode-attention kernel stage by stage on the chip.

Stages: 1 = K·qd logits dot only; 2 = + softmax/rescale chain;
3 = + PV dot (full kernel); 3t = PV dot with an explicit p transpose
before a normal (non-sublane-contracting) matmul.

Usage: python tools/exp_kernel_ablate.py <stage>
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
L, B, S, H, D = 32, 1, int(os.environ.get('ABL_S', 640)), 32, 128
HD = H * D
R = 8


def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[:1]


def make_kernel(stage):
    def kernel(li_ref, qd_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr,
               acc_scr):
        k_flat = k_ref[0, 0].astype(jnp.bfloat16)            # (S, H*D)
        if stage == 0:   # DMA only: touch both blocks, no real compute
            o_ref[0] = k_flat[0:H, 0:D] + v_ref[0, 0][0:H, 0:D].astype(
                jnp.bfloat16)
            return
        logits = jax.lax.dot_general(
            k_flat, qd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (D ** -0.5)  # (S, H)
        if stage == 1:
            o_ref[0] = (jnp.zeros((H, D), jnp.float32)
                        + jnp.max(logits)).astype(o_ref.dtype)
            return
        logits = logits + b_ref[0].astype(jnp.float32).reshape(S, 1)
        m_new = jnp.max(logits, axis=0, keepdims=True)       # (1, H)
        p = jnp.exp(logits - m_new)
        l_new = jnp.sum(p, axis=0, keepdims=True)
        if stage == 2:
            o_ref[0] = jnp.broadcast_to(
                (m_new + l_new).reshape(H, 1), (H, D)).astype(o_ref.dtype)
            return
        p16 = p.astype(jnp.bfloat16)
        v_flat = v_ref[0, 0].astype(jnp.bfloat16)            # (S, H*D)
        if stage == 4:
            pt = jnp.swapaxes(p16, 0, 1)                     # (H, S)
            pv_all = jax.lax.dot_general(
                pt, v_flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (H, H*D)
        else:
            pv_all = jax.lax.dot_general(
                p16, v_flat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (H, H*D)
        kv3 = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 1)
        q3 = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 0)
        pv = jnp.sum(jnp.where(q3 == kv3, pv_all.reshape(H, H, D), 0.0),
                     axis=1)
        o_ref[0] = (pv / l_new.reshape(H, 1)).astype(o_ref.dtype)
    return kernel


def run_stage(stage):
    k_all = jnp.full((L, B, S, HD), 0.01, jnp.bfloat16)
    v_all = jnp.full((L, B, S, HD), 0.01, jnp.bfloat16)
    qd = jnp.full((B, HD, H), 0.01, jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)
    jax.block_until_ready((k_all, v_all))
    nbytes = k_all.size * 2 + v_all.size * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 1),
        in_specs=[
            pl.BlockSpec((1, HD, H), lambda bi, si, li: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, HD),
                         lambda bi, si, li: (li[0], bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, HD),
                         lambda bi, si, li: (li[0], bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bi, si, li: (bi, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda bi, si, li: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.VMEM((H, D), jnp.float32)],
    )

    def call(li):
        return pl.pallas_call(
            make_kernel(stage), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.bfloat16),
        )(jnp.asarray(li, jnp.int32).reshape(1), qd, k_all, v_all, bias)

    @jax.jit
    def run():
        def pass_(acc, _):
            def layer(carry, _):
                acc, li = carry
                o = call(li)
                return (acc + jnp.float32(jnp.sum(o)), li + 1), None
            (acc, _), _ = jax.lax.scan(layer, (acc, jnp.int32(0)), None,
                                       length=L)
            return acc, None
        acc, _ = jax.lax.scan(pass_, jnp.float32(0), None, length=R)
        return acc

    out = run()
    sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"stage {stage}: {t*1e3:.1f} ms for {R}x{L} = "
          f"{t/(R*L)*1e6:.1f} us/call, {R*nbytes/t/1e9:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    run_stage(int(sys.argv[1]))
