"""Training-step roofline / MFU (round-3 extension of the perf story).

Decode and prefill each have a speed-of-light section in ROUND_NOTES;
this gives the TRAINING step the same treatment: steady-state step time
+ MFU for the 7B stage-1 recipe (frozen backbone, projector-only — the
reference's `valley_stage1.yaml`) and the stage-2 LoRA recipe on one
v5e chip, with a remat on/off ablation.

FLOPs come from XLA's own cost model (`compiled.cost_analysis()`), so
frozen-weight dW pruning, remat recompute and the vision tower's pruned
backward are all counted as compiled, not estimated.

MFU = XLA flops / (device time x 197e12) — v5e bf16 MXU peak.  Device
time subtracts the measured per-dispatch floor (~25 ms on this fabric).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_train_mfu.py [batch] [seqlen] [frames]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12


def sync(x):
    leaf = [l for l in jax.tree.leaves(x)
            if hasattr(l, "dtype")][0]
    return np.asarray(jax.device_get(jnp.sum(
        leaf.astype(jnp.float32))))


def make_batch(cfg, b, s, t):
    """Synthetic stage-shaped batch: media span + text, labels masked on
    the prompt half (reference masking shape, content irrelevant to
    FLOPs)."""
    from valley_tpu.constants import IGNORE_INDEX

    tok = cfg.tokens
    p = cfg.num_patches
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    rng = np.random.default_rng(0)
    ids = np.zeros((b, s), np.int32)
    labels = np.full((b, s), IGNORE_INDEX, np.int32)
    hi = min(30000, cfg.text.vocab_size - 1)
    for i in range(b):
        row = [1] + span + rng.integers(5, hi, size=s - len(span) - 1
                                        ).tolist()
        ids[i] = row
        labels[i, len(span) + s // 4:] = ids[i, len(span) + s // 4:]
    return {
        "input_ids": ids,
        "labels": labels,
        "attention_mask": np.ones((b, s), np.int32),
        "images": rng.standard_normal(
            (b, t, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32),
    }


def cost_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure(trainer, batch, iters=4):
    from valley_tpu.train.trainer import TrainState

    state = trainer.state
    dev = trainer._device_batch(batch)
    state, m = trainer._train_step(state, dev)   # compile + warm
    sync(m["loss"])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = trainer._train_step(state, dev)
        sync(m["loss"])
        ts.append(time.perf_counter() - t0)
    trainer.state = state
    return min(ts)


def run_recipe(tag, cfg, make_params, tc, batch, t_null, lora=False):
    from valley_tpu.train.trainer import Trainer

    # fresh params per recipe: the jitted step donates the TrainState, so
    # a shared tree would be dead after the first recipe's steps (and at
    # 7B a defensive copy would not fit next to the original)
    params = make_params()
    if lora:
        from valley_tpu.train import lora as lora_lib

        params = lora_lib.add_lora(params, jax.random.key(1), r=16)
    trainer = Trainer(cfg, tc, params, [batch], total_steps=100)
    dev = trainer._device_batch(batch)
    flops = cost_flops(
        trainer._train_step.lower(trainer.state, dev).compile())
    t = measure(trainer, batch)
    td = max(t - t_null, 1e-9)
    tok = batch["input_ids"].size
    print(f"{tag}: {t*1e3:7.1f} ms raw / {td*1e3:7.1f} ms device  "
          f"({flops/1e12:.2f} TFLOP, device MFU "
          f"{flops/td/PEAK_BF16:.2%}, {tok/td:.0f} tok/s)",
          flush=True)
    del trainer
    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from valley_tpu import config as C
    from valley_tpu.models import valley
    from valley_tpu.train.trainer import TrainConfig

    import os

    if os.environ.get("VALLEY_MFU_TINY"):   # CPU smoke of the harness
        jax.config.update("jax_platforms", "cpu")
        cfg = C.valley_tiny()
        s = min(s, 64)
    else:
        cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
            im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
            vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))

    def make_params():
        p = jax.tree.map(lambda sh: jnp.full(sh.shape, 0.008, sh.dtype),
                         shapes)
        jax.block_until_ready(p)
        return p

    batch = make_batch(cfg, b, s, t)

    t_null_fn = jax.jit(lambda x: x + 1.0)
    sync(t_null_fn(jnp.float32(0)))
    t0 = time.perf_counter()
    sync(t_null_fn(jnp.float32(1)))
    t_null = time.perf_counter() - t0
    size = "tiny" if os.environ.get("VALLEY_MFU_TINY") else "7B"
    print(f"B={b} S={s} T={t} {size} bf16  (dispatch floor "
          f"{t_null*1e3:.1f} ms)", flush=True)

    stage1 = TrainConfig(output_dir="/tmp/mfu_s1", freeze_backbone=True,
                         tune_mm_mlp_adapter=True,
                         gradient_checkpointing=True)
    run_recipe("stage1 remat on ", cfg, make_params, stage1, batch,
               t_null)

    try:
        s1_nr = TrainConfig(output_dir="/tmp/mfu_s1nr",
                            freeze_backbone=True,
                            tune_mm_mlp_adapter=True,
                            gradient_checkpointing=False)
        run_recipe("stage1 remat off", cfg, make_params, s1_nr, batch,
                   t_null)
    except Exception as e:  # noqa: BLE001 — expected OOM path
        print(f"stage1 remat off: failed ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)

    try:
        lora = TrainConfig(output_dir="/tmp/mfu_lora", lora=True,
                           tune_mm_mlp_adapter=True,
                           gradient_checkpointing=True)
        run_recipe("stage2 lora r16 ", cfg, make_params, lora, batch,
                   t_null, lora=True)
    except Exception as e:  # noqa: BLE001
        print(f"stage2 lora: failed ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
