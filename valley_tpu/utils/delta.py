"""Weight delta tools: distribute Valley weights as base-LLaMA deltas.

Working equivalents of `valley/model/make_delta.py` / `apply_delta.py`
(both broken as shipped — they import `valley` with no package
`__init__.py`; and `make_delta.py:34` leaks an HF auth token, not
replicated here).  Semantics preserved: elementwise subtract/add against
the base state dict; `model.embed_tokens.weight` / `lm_head.weight` may
have extra rows (the added special tokens) — only the overlapping slice is
deltaed; projector/vision/pooling weights pass through untouched.

Operates on HF-layout state dicts via the bridge, so deltas interoperate
with reference-produced checkpoints.

Usage:
  python -m valley_tpu.utils.delta make  --base B --target T --delta D
  python -m valley_tpu.utils.delta apply --base B --delta D --target T
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)

PASS_THROUGH_MARKERS = ("mm_projector", "vision_tower", "pooling_layer",
                        "transformer_delta_encoder", "position_matrix")
RESIZABLE = ("model.embed_tokens.weight", "lm_head.weight")


def _combine(target_sd: Dict[str, np.ndarray],
             base_sd: Dict[str, np.ndarray], sign: int
             ) -> Dict[str, np.ndarray]:
    out = {}
    for name, param in target_sd.items():
        param = np.asarray(param)
        if name not in base_sd:
            if not any(m in name for m in PASS_THROUGH_MARKERS):
                raise KeyError(f"{name} not in base model")
            out[name] = param
            continue
        bparam = np.asarray(base_sd[name])
        if param.shape == bparam.shape:
            out[name] = param + sign * bparam
        else:
            if name not in RESIZABLE:
                raise ValueError(
                    f"{name} dimension mismatch: {param.shape} vs "
                    f"{bparam.shape}")
            merged = param.copy()
            merged[:bparam.shape[0], :bparam.shape[1]] += sign * bparam
            out[name] = merged
    return out


def _save_sd(path: str, sd: Dict[str, np.ndarray], src_dir: str) -> None:
    os.makedirs(path, exist_ok=True)
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
    # carry over config + tokenizer files so the result is loadable
    for fname in ("config.json", "tokenizer.model", "tokenizer.json",
                  "tokenizer_config.json", "special_tokens_map.json",
                  "generation_config.json"):
        src = os.path.join(src_dir, fname)
        if os.path.isfile(src):
            import shutil

            shutil.copy(src, os.path.join(path, fname))


def make_delta(base_model_path: str, target_model_path: str,
               delta_path: str) -> None:
    from valley_tpu.utils.hf_bridge import read_state_dict

    logger.info("Loading base model")
    base_sd = read_state_dict(base_model_path)
    logger.info("Loading target model")
    target_sd = read_state_dict(target_model_path)
    logger.info("Calculating delta")
    delta = _combine(target_sd, base_sd, sign=-1)
    _save_sd(delta_path, delta, target_model_path)
    logger.info("Saved delta to %s", delta_path)


def apply_delta(base_model_path: str, delta_path: str,
                target_model_path: str) -> None:
    from valley_tpu.utils.hf_bridge import read_state_dict

    logger.info("Loading base model")
    base_sd = read_state_dict(base_model_path)
    logger.info("Loading delta")
    delta_sd = read_state_dict(delta_path)
    logger.info("Applying delta")
    target = _combine(delta_sd, base_sd, sign=+1)
    _save_sd(target_model_path, target, delta_path)
    logger.info("Saved target model to %s", target_model_path)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    mk = sub.add_parser("make")
    mk.add_argument("--base-model-path", required=True)
    mk.add_argument("--target-model-path", required=True)
    mk.add_argument("--delta-path", required=True)
    ap = sub.add_parser("apply")
    ap.add_argument("--base-model-path", required=True)
    ap.add_argument("--delta-path", required=True)
    ap.add_argument("--target-model-path", required=True)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.cmd == "make":
        make_delta(args.base_model_path, args.target_model_path,
                   args.delta_path)
    else:
        apply_delta(args.base_model_path, args.delta_path,
                    args.target_model_path)


if __name__ == "__main__":
    main()
