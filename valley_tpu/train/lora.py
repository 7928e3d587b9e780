"""LoRA as param-tree surgery.

The reference wraps the model with peft (`train.py:153-161`: r=16, α=32,
dropout 0.05, targets q/k/v/o + mlp gate/down/up on every layer) and merges
with `merge_and_unload` at inference (`run_valley.py:33-34`).  Here LoRA is
just extra arrays in ``params["llama"]["layers"]`` — ``<name>_lora_a``
(H, r), ``<name>_lora_b`` (r, H'), stacked over layers — which
`llama._proj` picks up automatically.  Freezing the base is a trainable
mask over the tree (see trainer), not module flags.  The peft
``lora_dropout=0.05`` is applied at train time by the trainer passing a
per-step ``lora_rng`` into the forward (`llama._proj`); inference/eval
paths pass no rng and get the deterministic adapter.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# reference target_modules -> our stacked weight names
DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_down", "w_up")


def add_lora(params, key: jax.Array, r: int = 16, alpha: int = 32,
             targets: Sequence[str] = DEFAULT_TARGETS, dtype=jnp.bfloat16):
    """Return a new param tree with LoRA factors added to the LLaMA layers.

    A ~ N(0, 1/r) scaled kaiming-ish, B = 0 (torch-LoRA convention: the
    delta starts at zero so step 0 matches the base model exactly).
    """
    layers = dict(params["llama"]["layers"])
    n_layers = layers["wq"].shape[0]
    keys = jax.random.split(key, len(targets))
    for tk, name in zip(keys, targets):
        w = layers[name]                 # (L, out, in) — torch layout
        _, fan_out, fan_in = w.shape
        a = (jax.random.normal(tk, (n_layers, fan_in, r), jnp.float32)
             * (fan_in ** -0.5)).astype(dtype)
        b = jnp.zeros((n_layers, r, fan_out), dtype)
        layers[name + "_lora_a"] = a
        layers[name + "_lora_b"] = b
    layers["lora_scale"] = jnp.full((n_layers, 1, 1), alpha / r, dtype)
    out = dict(params)
    out["llama"] = dict(params["llama"], layers=layers)
    return out


def merge_lora(params):
    """Fold A@B·scale into the base weights and strip the factors —
    `merge_and_unload` parity for serving."""
    layers = dict(params["llama"]["layers"])
    scale = layers.get("lora_scale")
    if scale is None:
        return params
    merged = {}
    for k, v in layers.items():
        if k.endswith("_lora_a") or k.endswith("_lora_b") or \
                k == "lora_scale":
            continue
        a = layers.get(k + "_lora_a")
        if a is not None:
            b = layers[k + "_lora_b"]
            # delta in the base weights' (L, out, in) layout
            delta = jnp.einsum("lir,lro->loi", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scale[:, 0, 0][:, None, None]
            v = (v.astype(jnp.float32) + delta).astype(v.dtype)
        merged[k] = v
    out = dict(params)
    out["llama"] = dict(params["llama"], layers=merged)
    return out


def is_lora_key(path: tuple) -> bool:
    last = str(path[-1])
    return last.endswith("_lora_a") or last.endswith("_lora_b")


def split_lora(params):
    """Extract only the adapter arrays (for adapter-only checkpoints,
    parity with `LLMCallback` saving, `trainner.py:51-120`)."""
    layers = params["llama"]["layers"]
    return {k: v for k, v in layers.items()
            if k.endswith("_lora_a") or k.endswith("_lora_b")
            or k == "lora_scale"}


def load_lora(params, adapter):
    layers = dict(params["llama"]["layers"])
    layers.update(adapter)
    out = dict(params)
    out["llama"] = dict(params["llama"], layers=layers)
    return out
