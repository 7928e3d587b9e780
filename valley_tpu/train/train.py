"""Training entry point: YAML experiment config -> two-stage Valley recipe.

Parity with `valley/train/train.py`: the same YAML keys drive the same
semantics (`ModelArguments`/`DataArguments`/`TrainingArguments`,
`train.py:19-84`), including stage-1 projector pretrain (freeze_backbone +
tune_mm_mlp_adapter) and stage-2 full/LoRA finetune.  DeepSpeed JSON knobs
are replaced by the mesh_* keys (sharding rules do ZeRO's job).

Run:  python -m valley_tpu.train.train --conf valley_tpu/configs/experiment/<x>.yaml
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from valley_tpu import config as C
from valley_tpu.data.dataset import (DataLoader,
                                     make_video_supervised_data_module)
from valley_tpu.models import valley
from valley_tpu.train import lora as lora_lib
from valley_tpu.train.trainer import TrainConfig, Trainer
from valley_tpu.utils.logging import print_trainable_params

logger = logging.getLogger(__name__)


@dataclass
class ModelArguments:
    model_name_or_path: str = ""
    vision_tower: Optional[str] = None
    mm_vision_select_layer: int = -1
    pretrain_mm_mlp_adapter: Optional[str] = None
    mm_use_im_start_end: bool = False
    tune_llm_layer: Optional[str] = None
    patch_pooling_method: str = "mean"
    use_patch_importance_pooling: bool = False
    use_delta_transformer: bool = False
    model_size: str = "7b"          # "7b" | "13b" | "tiny"


@dataclass
class DataArguments:
    data_path: Optional[str] = None
    fashion_data_path: Optional[str] = None
    video_data_path: Optional[str] = None
    lazy_preprocess: bool = False
    is_multimodal: bool = False
    sep_image_conv_front: bool = False
    image_token_len: int = 0
    eval_num: int = 400
    image_folder: Optional[str] = None
    video_folder: Optional[str] = None
    fashion_image_folder: Optional[str] = None
    image_aspect_ratio: str = "square"
    num_image: int = 4
    multi_image: bool = True
    multi_image_mode: str = "concatenate"
    use_fashion: bool = False
    fast_epoch: bool = False
    conv_mode: str = "v1"
    only_mask_system: bool = False
    project_name: str = "valley"
    num_frames: int = 8


def load_yaml_config(path: str):
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)

    def fill(cls):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in names})

    model_args = fill(ModelArguments)
    data_args = fill(DataArguments)
    tc_names = {f.name for f in dataclasses.fields(TrainConfig)}
    tc = TrainConfig(**{k: v for k, v in raw.items() if k in tc_names})
    tc = dataclasses.replace(tc, learning_rate=float(tc.learning_rate))
    extra = {k: v for k, v in raw.items()
             if k in ("model_max_length", "bf16", "fp16",
                      "rope_scaling")}
    return model_args, data_args, tc, extra


def resolve_pooling(model_args: ModelArguments) -> str:
    # `train.py:28-29` flag precedence
    if model_args.use_delta_transformer:
        return "temporal_transformer"
    if model_args.use_patch_importance_pooling:
        return "temporal_importance"
    return model_args.patch_pooling_method or "mean"


def load_framework_checkpoint(path: str, model_max_length: int = 2048):
    """Load a training output dir produced by this framework (the sidecar
    valley_config.json + orbax 'final' tree) — the stage-1 -> stage-2
    handoff."""
    import json

    from valley_tpu.utils import checkpoint as ckpt_lib

    with open(os.path.join(path, "valley_config.json")) as f:
        cfg = C.ValleyConfig.from_json(f.read())
    meta = {}
    meta_path = os.path.join(path, "valley_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if meta.get("lora"):
        raise ValueError(
            f"{path} is a LoRA output (adapter-only). Load the base "
            f"checkpoint and pass lora_path={path}/final instead.")
    params = ckpt_lib.restore_pytree(
        os.path.join(path, meta.get("final", "final")))

    tok_path = meta.get("tokenizer_path", "")
    if tok_path and os.path.isdir(tok_path):
        from valley_tpu.tokenizer import load_hf_tokenizer

        tokenizer, tokens = load_hf_tokenizer(tok_path, model_max_length)
        cfg = cfg.replace(tokens=tokens)
    else:
        from valley_tpu.tokenizer import ByteFallbackTokenizer

        tokenizer = ByteFallbackTokenizer(model_max_length=model_max_length)
        cfg = cfg.replace(tokens=tokenizer.special_tokens())
    return cfg, params, tokenizer


def build_model_and_tokenizer(model_args: ModelArguments, extra: dict,
                              dtype=jnp.bfloat16):
    """Load (or init) the model + tokenizer.

    With a real checkpoint path, weights come through the HF bridge
    (`valley_tpu.utils.hf_bridge`); 'tiny'/'random:*' configs init randomly
    for smoke runs (the reference's fast_epoch de-facto integration test).
    """
    pooling = resolve_pooling(model_args)
    path = model_args.model_name_or_path
    max_len = int(extra.get("model_max_length", 2048))

    if path and os.path.isdir(path):
        if os.path.isfile(os.path.join(path, "valley_config.json")):
            # a previous stage's output dir from THIS framework
            return load_framework_checkpoint(path, max_len)
        from valley_tpu.utils import hf_bridge

        cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(
            path, vision_tower=model_args.vision_tower,
            select_layer=model_args.mm_vision_select_layer,
            pooling=pooling, dtype=dtype, model_max_length=max_len)
        return cfg, params, tokenizer

    # random-weight configs for integration tests / dry runs
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tokenizer = ByteFallbackTokenizer(model_max_length=max_len)
    if model_args.model_size == "tiny" or path.startswith("random"):
        cfg = C.valley_tiny(patch_pooling_method=pooling)
        cfg = cfg.replace(tokens=tokenizer.special_tokens())
    else:
        base = C.LLAMA2_13B if "13" in model_args.model_size else C.LLAMA2_7B
        cfg = C.ValleyConfig(text=base, tokens=tokenizer.special_tokens(),
                             patch_pooling_method=pooling)
    params = valley.init_params(cfg, jax.random.key(0), dtype)
    if model_args.pretrain_mm_mlp_adapter:
        from valley_tpu.utils import checkpoint as ckpt_lib

        params["projector"] = ckpt_lib.restore_pytree(
            model_args.pretrain_mm_mlp_adapter, params["projector"])
    return cfg, params, tokenizer


def train(conf_path: str) -> int:
    model_args, data_args, tc, extra = load_yaml_config(conf_path)
    dtype = jnp.bfloat16 if extra.get("bf16", True) else jnp.float32

    cfg, params, tokenizer = build_model_and_tokenizer(model_args, extra,
                                                       dtype)
    rs = float(extra.get("rope_scaling", 1.0))
    if rs != 1.0:
        # linear rope position interpolation for long-context recipes
        # (ops/rope.py); train and serve with the SAME factor
        import dataclasses as _dc

        cfg = cfg.replace(text=_dc.replace(cfg.text, rope_scaling=rs))
    if tc.lora:
        params = lora_lib.add_lora(params, jax.random.key(1), r=tc.lora_r,
                                   alpha=tc.lora_alpha, dtype=dtype)

    data_args.is_multimodal = data_args.is_multimodal or \
        model_args.vision_tower is not None
    data_args.mm_use_im_start_end = model_args.mm_use_im_start_end
    # keep the host pipeline geometry in lockstep with the vision config
    # (the reference hardcodes 224/14 in several places, SURVEY §7)
    data_args.crop_size = cfg.vision.image_size
    data_args.scale_size = max(cfg.vision.image_size * 256 // 224,
                               cfg.vision.image_size)
    data_args.patch_size = cfg.vision.patch_size
    module = make_video_supervised_data_module(tokenizer, data_args)
    if jax.process_count() > 1:
        # multi-host shards must agree on shape without seeing each
        # other's samples: fix the collator's padded geometry
        coll = module["data_collator"]
        coll.pad_to_length = coll.max_length
        coll.pad_frames_to = data_args.num_frames
        coll.image_size = cfg.vision.image_size
    # per_device semantics (reference torchrun: batch per GPU): the global
    # batch scales with the data-parallel world size (data x fsdp axes).
    n_dev = len(jax.devices())
    model_par = max(tc.mesh_model, 1)
    global_batch = tc.per_device_train_batch_size * max(
        n_dev // model_par, 1)
    # multi-host: each process loads only its rows of the global batch
    # (torchrun per-rank sampler equivalent; see data.DataLoader and
    # parallel.shard_batch)
    loader = DataLoader(module["train_dataset"], global_batch,
                        module["data_collator"], seed=tc.seed,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    eval_fn = None
    if tc.evaluation_strategy == "steps":
        eval_engine = {}  # persists across eval steps: one compile total

        def eval_fn(current_params, step):
            from valley_tpu.inference.engine import Engine, GenerationConfig
            from valley_tpu.train.eval_loop import generate_eval

            p = jax.device_get(current_params)
            if tc.lora:
                p = lora_lib.merge_lora(p)
            eng = eval_engine.get("engine")
            if eng is None:
                max_len = getattr(tokenizer, "model_max_length", 2048)
                eng = Engine(cfg, p, buckets=(min(1024, max_len), max_len),
                             max_new_tokens=256)
                eval_engine["engine"] = eng
            else:
                # same shapes/dtypes -> the jitted prefill/decode
                # executables are reused, no recompile
                eng.params = jax.device_put(p)
            return generate_eval(
                eng, tokenizer, module["train_dataset"],
                eval_num=tc.eval_num, conv_mode=data_args.conv_mode,
                gen=GenerationConfig(max_new_tokens=128, do_sample=False))

    trainer = Trainer(cfg, tc, params, loader, eval_fn=eval_fn)
    print_trainable_params(trainer.state.params, trainer.labels)
    step = trainer.train(resume=True)

    # final save (`safe_save_model_for_hf_trainer` parity): LoRA ->
    # adapter-only, else full params
    from valley_tpu.utils import checkpoint as ckpt_lib

    final_dir = os.path.join(tc.output_dir, "final")
    if tc.lora:
        ckpt_lib.save_pytree(final_dir,
                             lora_lib.split_lora(trainer.state.params))
    else:
        ckpt_lib.save_pytree(final_dir, trainer.state.params)
    # sidecar metadata so this dir is loadable as the next stage's
    # model_name_or_path (stage-1 -> stage-2 flow within this framework)
    import json as _json

    with open(os.path.join(tc.output_dir, "valley_config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(tc.output_dir, "valley_meta.json"), "w") as f:
        _json.dump({"lora": bool(tc.lora),
                    "tokenizer_path": model_args.model_name_or_path,
                    "final": "final"}, f)
    if tc.export_hf and not tc.lora:
        from valley_tpu.utils.hf_bridge import export_valley_checkpoint

        hf_dir = os.path.join(tc.output_dir, "hf")
        tok_src = model_args.model_name_or_path \
            if os.path.isdir(model_args.model_name_or_path) else None
        export_valley_checkpoint(cfg, jax.device_get(trainer.state.params),
                                 hf_dir, tokenizer_src=tok_src)
        logger.info("HF export written to %s", hf_dir)
    logger.info("training done at step %d; saved to %s", step, final_dir)

    # post-training generate-eval (stage-2 predict_with_generate flow;
    # eval subset = first eval_num training samples, `eval_num` knob)
    if tc.predict_with_generate and len(module["train_dataset"]):
        from valley_tpu.inference.engine import Engine, GenerationConfig
        from valley_tpu.train.eval_loop import generate_eval

        params_eval = jax.device_get(trainer.state.params)
        if tc.lora:
            params_eval = lora_lib.merge_lora(params_eval)
        max_len = getattr(tokenizer, "model_max_length", 2048)
        engine = Engine(cfg, params_eval,
                        buckets=(min(1024, max_len), max_len),
                        max_new_tokens=min(tc.generation_max_length, 1024))
        pred_file = tc.prediction_file_name or os.path.join(
            tc.output_dir, "eval_result.jsonl")
        metrics = generate_eval(
            engine, tokenizer, module["train_dataset"],
            eval_num=tc.eval_num, conv_mode=data_args.conv_mode,
            prediction_file=pred_file,
            gen=GenerationConfig(max_new_tokens=256, do_sample=False))
        trainer.log({"step": step, **{f"eval_{k}": v
                                      for k, v in metrics.items()}})
    return step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    train(args.conf)


if __name__ == "__main__":
    main()
