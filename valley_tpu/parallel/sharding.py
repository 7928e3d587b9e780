"""Sharding rules: one PartitionSpec per weight kind.

ZeRO-2/3 and tensor parallelism are *rules here*, not code: sharding the
stacked layer weights over ``fsdp`` reproduces DeepSpeed ZeRO-3's
param-gather schedule (`valley/configs/deepspeed/config_zero3.json`) via
XLA-inserted collectives; the ``model`` axis partitions attention heads and
the MLP hidden dim megatron-style.  Batches shard over (data, fsdp).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _llama_layer_specs():
    # stacked weights: leading axis = layer (never sharded).  Weights are
    # stored (L, out, in) — torch Linear layout (see llama.init_params) —
    # so tensor parallelism puts the head/ffn (out) dim of q/k/v/gate/up
    # on 'model' at axis 1, and their 'in' dim on 'fsdp' at axis 2; o/down
    # contract over the model-sharded dim (axis 2).
    return {
        "attn_norm": P(),
        # fused serving layout (llama.fuse_llama_params); TP users should
        # prefer the unfused layout (head-aligned shards)
        "wqkv": P(None, "model", "fsdp"),
        "w_gateup": P(None, "model", "fsdp"),
        "wq": P(None, "model", "fsdp"),
        "wk": P(None, "model", "fsdp"),
        "wv": P(None, "model", "fsdp"),
        "wo": P(None, "fsdp", "model"),
        "mlp_norm": P(),
        "w_gate": P(None, "model", "fsdp"),
        "w_up": P(None, "model", "fsdp"),
        "w_down": P(None, "fsdp", "model"),
    }


def llama_param_specs(params_llama) -> Any:
    layer_specs = _llama_layer_specs()
    specs = {
        "embed": P("model", "fsdp"),
        "final_norm": P(),
        "lm_head": P("fsdp", "model"),
        "layers": {k: layer_specs.get(_base_name(k), _lora_spec(k))
                   for k in params_llama["layers"]},
    }
    if "lm_head_scale" in params_llama:
        specs["lm_head_scale"] = P(None, "model")
    return specs


def _base_name(key: str) -> str:
    for suffix in ("_lora_a", "_lora_b"):
        if key.endswith(suffix):
            return ""
    return key


def _lora_spec(key: str) -> P:
    # LoRA factors are tiny; shard only the big dimension.
    if key.endswith("_lora_a"):
        return P(None, "fsdp", None)
    if key.endswith("_lora_b"):
        return P(None, None, "model")
    if key == "lora_scale":
        return P()                       # (L, 1, 1) alpha/r scalar
    if key.endswith("_scale") or key.endswith("_scale_a8"):
        # int8 quantization scales (L, out): follow the output (model)
        # axis of their (L, out, in) weight (``_scale_a8`` = the W8A8
        # opt-in spelling, ops/quant.quantize_llama_params act8)
        return P(None, "model")
    return P()


def vision_param_specs(params_vision) -> Any:
    layer = {
        "ln1_scale": P(), "ln1_bias": P(),
        "ln2_scale": P(), "ln2_bias": P(),
        "wq": P(None, "fsdp", "model"), "bq": P(None, "model"),
        "wk": P(None, "fsdp", "model"), "bk": P(None, "model"),
        "wv": P(None, "fsdp", "model"), "bv": P(None, "model"),
        "wo": P(None, "model", "fsdp"), "bo": P(),
        "fc1": P(None, "fsdp", "model"), "fc1_bias": P(None, "model"),
        "fc2": P(None, "model", "fsdp"), "fc2_bias": P(),
    }

    def spec(k: str) -> P:
        # int8 tower scales (L, 1, out) — quantize_vision_params: follow
        # the out axis of their (L, in, out) weight
        for suffix in ("_scale_a8", "_scale"):
            base = k[:-len(suffix)]
            if k.endswith(suffix) and base in ("wq", "wk", "wv", "wo",
                                               "fc1", "fc2"):
                return P(None, None, layer[base][2])
        return layer[k]

    return {
        "class_embedding": P(),
        "patch_embedding": P(None, "fsdp"),
        "position_embedding": P(None, "fsdp"),
        "pre_ln_scale": P(), "pre_ln_bias": P(),
        "layers": {k: spec(k) for k in params_vision["layers"]},
    }


def temporal_param_specs(params_temporal) -> Any:
    # Temporal module is small (one layer / one vector): replicate, except
    # the v2 importance projection whose input dim is P*hidden.
    return {k: (P("fsdp", None) if k == "pooling_w" else P())
            for k in params_temporal}


def param_specs(params) -> Any:
    """PartitionSpec tree matching a full Valley param tree."""
    specs = {}
    if "llama" in params:
        specs["llama"] = llama_param_specs(params["llama"])
    if "vision" in params:
        specs["vision"] = vision_param_specs(params["vision"])
    if "projector" in params:
        specs["projector"] = {"w": P("fsdp", "model"), "b": P("model")}
    if "temporal" in params:
        specs["temporal"] = temporal_param_specs(params["temporal"])
    return specs


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params) -> Any:
    """Place a param tree onto the mesh according to the rules."""
    return jax.device_put(params, param_shardings(mesh, params))


def _path_keys(path) -> tuple:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        elif hasattr(k, "name"):
            out.append(k.name)
        else:
            out.append(str(k))
    return tuple(out)


def opt_state_shardings(mesh: Mesh, params, opt_state_avals) -> Any:
    """Shardings for an optax state tree: subtrees that mirror the param
    tree (Adam mu/nu — their leaf paths end with a param leaf's path and
    have its shape) shard exactly like that param; step counters and
    anything unrecognized replicate.

    Why this exists: ``jax.jit(tx.init, in_shardings=...)`` does NOT give
    a sharded optimizer state — optax inits consume only the *shapes* of
    their argument, XLA DCEs the sharded inputs, the lowering drops to a
    single device, and the moments come back placed on ONE chip.  At 7B
    that is ~27 GB of Adam state on a 16 GB chip: an init-time OOM on
    real multi-chip meshes that tiny-shape dryruns never catch (state is
    correctly NamedSharded again after step 1 — too late).  Pass this
    tree as ``out_shardings`` to the init jit instead."""
    pshard = param_shardings(mesh, params)
    by_suffix = {}
    for path, sh in jax.tree_util.tree_leaves_with_path(pshard):
        by_suffix[_path_keys(path)] = sh
    shapes = {_path_keys(p): tuple(a.shape)
              for p, a in jax.tree_util.tree_leaves_with_path(params)}
    rep = NamedSharding(mesh, P())
    depth = max((len(k) for k in by_suffix), default=0)

    def pick(path, aval):
        keys = _path_keys(path)
        shape = tuple(getattr(aval, "shape", ()))
        for i in range(max(0, len(keys) - depth), len(keys)):
            sh = by_suffix.get(keys[i:])
            if sh is not None and shapes.get(keys[i:]) == shape:
                return sh
        return rep

    return jax.tree_util.tree_map_with_path(pick, opt_state_avals)


def kv_cache_sharding(mesh: Mesh, batch: int, kv_heads: int,
                      ndim: int = 5) -> NamedSharding:
    """KV cache (L, B, S, Hkv, D): batch over (data, fsdp) and kv heads
    over model — decode attention then needs no resharding.  Axes that
    don't divide their dim (e.g. batch 1 with fsdp > 1) are dropped.
    ``ndim=4`` gives the matching spec for (L, B, S, Hkv) int8-cache
    scale arrays."""
    dp = int(mesh.shape["data"]) * int(mesh.shape["fsdp"])
    batch_axes = ("data", "fsdp") if dp > 1 and batch % dp == 0 else None
    model_axis = "model" if kv_heads % int(mesh.shape["model"]) == 0 \
        else None
    parts = (None, batch_axes, None, model_axis, None)[:ndim]
    return NamedSharding(mesh, P(*parts))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over (data, fsdp): every non-TP device holds a slice."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def shard_batch(mesh: Mesh, batch) -> Any:
    """Place a host batch onto the mesh, batch dim over (data, fsdp).

    Single-process: ``batch`` is the global batch, device_put splits it.
    Multi-process (``jax.process_count() > 1``): ``batch`` is this
    process's contiguous rows of the global batch
    (`data.DataLoader(process_index=, process_count=)` yields exactly
    those) and `jax.make_array_from_process_local_data` assembles the
    logical global array — each host only ever touches its own shard,
    the JAX equivalent of the reference's per-rank torchrun DataLoaders
    (`valley/train/train.sh:1`)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def process_batch_slice(mesh: Mesh, global_batch: int) -> slice:
    """The global-batch row interval THIS process must load so
    `shard_batch`'s multi-process assembly is the identity: derived from
    the batch sharding's device->index map.  Raises if the mesh does not
    give this process one contiguous block (meshes from `create_mesh` /
    `multislice_mesh` do: jax.devices() orders by process, which becomes
    the leading batch axis)."""
    sh = batch_sharding(mesh)
    idx_map = sh.devices_indices_map((global_batch,))
    spans = sorted({((s[0].start or 0),
                     (global_batch if s[0].stop is None else s[0].stop))
                    for d, s in idx_map.items()
                    if d.process_index == jax.process_index()})
    lo, hi = spans[0][0], spans[-1][1]
    covered = 0
    end = lo
    for a, b in spans:
        if a > end:
            raise ValueError(
                f"mesh gives process {jax.process_index()} non-contiguous "
                f"batch rows {spans}; DataLoader's contiguous rank slice "
                "cannot feed it")
        end = max(end, b)
        covered = end - lo
    assert covered == hi - lo
    return slice(lo, hi)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
