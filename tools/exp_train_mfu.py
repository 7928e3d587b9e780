"""Training-step roofline / MFU (round-3 extension of the perf story).

Decode and prefill each have a speed-of-light section in ROUND_NOTES;
this gives the TRAINING step the same treatment: steady-state step time
+ MFU for the 7B stage-1 recipe (frozen backbone, projector-only — the
reference's `valley_stage1.yaml`) and the stage-2 LoRA recipe on one
v5e chip, with a remat on/off ablation.

FLOPs are counted analytically per recipe (XLA's `cost_analysis()`
counts a `lax.scan` body ONCE, undercounting the 32-layer stack ~20x —
verified here: it reports 1.91 TFLOP for a step that provably runs
~30).  Accounting, matmul-only + attention:

  - frozen matmuls (stage-1 LLM, lm_head/embed): fwd + dX        (2x)
  - trainable matmuls (projector, LoRA adapters): fwd + dX + dW  (3x)
  - attention (no weights): fwd + ~2x fwd backward               (3x)
  - frozen vision tower behind stop_gradient: fwd only           (1x)

MFU uses MODEL flops (remat recompute excluded — that is the point of
MFU vs HFU); the remat-off row holds the flops fixed so the delta IS
the recompute+restaging cost.  Device time subtracts the measured
per-dispatch floor (~25 ms on this fabric).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_train_mfu.py [batch] [seqlen] [frames] [recipe]

recipe — run ONE per process on the real chip (a prior recipe's 14 GB
param tree fragments the 16 GB HBM):
  all      s1 + s1dots + s1nr + lora in sequence (tiny/CPU smoke only)
  s1       stage-1 (frozen backbone, projector-only), full remat
  s1dots   stage-1 with gradient_checkpointing="dots"
  s1nr     stage-1, remat off (expected compile-OOM at 7B B2xS512)
  lora     stage-2 LoRA r16 with dropout (TrainConfig default rng impl)
  lorand   stage-2 LoRA, dropout 0.0 (isolates the mask-RNG cost)
  loradots stage-2 LoRA with gradient_checkpointing="dots"
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


def train_flops(cfg, b, s, t, recipe) -> float:
    """Analytic MODEL flops for one train step (no remat recompute).

    Frozen matmuls contribute fwd + dX (2x fwd); trainable ones fwd +
    dX + dW (3x); attention has no weights -> fwd + ~2x fwd backward;
    the stop_gradient'ed vision tower is forward-only.
    """
    tc, vc = cfg.text, cfg.vision
    tok = b * s

    # LLM decoder matmul weights (wq/wo square, wk/wv at kv_heads width,
    # gate/up/down MLP) — frozen in both stage-1 and the LoRA recipe.
    wparams = tc.num_hidden_layers * (
        2 * tc.hidden_size * tc.hidden_size
        + 2 * tc.hidden_size * tc.head_dim * tc.kv_heads
        + 3 * tc.hidden_size * tc.intermediate_size)
    llm = 2 * 2 * wparams * tok
    # causal attention: QK^T + PV, fwd 2 * (S^2/2) * h * 2; bwd ~2x fwd
    attn = 3 * tc.num_hidden_layers * (s * s // 2) * tc.hidden_size \
        * 2 * 2 * b
    # lm_head + embed-gather: loss over every position, dX only
    head = 2 * 2 * tc.hidden_size * tc.vocab_size * tok

    # frozen CLIP tower behind stop_gradient: forward only
    n = vc.num_positions
    vw = vc.num_hidden_layers * (
        4 * vc.hidden_size * vc.hidden_size
        + 2 * vc.hidden_size * vc.intermediate_size)
    vis = b * t * (2 * vw * n
                   + vc.num_hidden_layers * n * n * vc.hidden_size * 4
                   + 2 * n * vc.hidden_size * 3 * vc.patch_size ** 2)

    # trainable projector: (num_patches pooled tokens + T CLS) per sample
    proj = 3 * 2 * vc.hidden_size * tc.hidden_size \
        * b * (cfg.num_patches + t)

    total = llm + attn + head + vis + proj
    if recipe == "lora":  # r=16 factors on all 7 targets, trainable
        lora_p = tc.num_hidden_layers * 16 * (
            4 * 2 * tc.hidden_size
            + 2 * (tc.hidden_size + tc.intermediate_size)
            + (tc.intermediate_size + tc.hidden_size))
        total += 3 * 2 * lora_p * tok
    return float(total)


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


def run_recipe(tag, cfg, make_params, tc, batch, t_null, flops,
               lora=False):
    from valley_tpu.train.trainer import Trainer

    # fresh params per recipe: the jitted step donates the TrainState, so
    # a shared tree would be dead after the first recipe's steps (and at
    # 7B a defensive copy would not fit next to the original)
    params = make_params()
    if lora:
        from valley_tpu.train import lora as lora_lib

        params = lora_lib.add_lora(params, jax.random.key(1), r=16)
    trainer = Trainer(cfg, tc, params, [batch], total_steps=100)
    t = measure(trainer, batch)
    td = max(t - t_null, 1e-9)
    tok = batch["input_ids"].size
    print(f"{tag}: {t*1e3:7.1f} ms raw / {td*1e3:7.1f} ms device  "
          f"({flops/1e12:.2f} model TFLOP, device MFU "
          f"{flops/td/PEAK_BF16:.2%}, {tok/td:.0f} tok/s)",
          flush=True)
    del trainer
    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    which = sys.argv[4] if len(sys.argv) > 4 else "all"

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

    f_s1 = train_flops(cfg, b, s, t, "s1")
    f_lora = train_flops(cfg, b, s, t, "lora")

    if which in ("all", "s1"):
        stage1 = TrainConfig(output_dir="/tmp/mfu_s1",
                             freeze_backbone=True,
                             tune_mm_mlp_adapter=True,
                             gradient_checkpointing=True)
        run_recipe("stage1 remat on ", cfg, make_params, stage1, batch,
                   t_null, f_s1)

    if which in ("all", "s1dots"):
        try:
            s1_d = TrainConfig(output_dir="/tmp/mfu_s1d",
                               freeze_backbone=True,
                               tune_mm_mlp_adapter=True,
                               gradient_checkpointing="dots")
            run_recipe("stage1 remat dots", cfg, make_params, s1_d,
                       batch, t_null, f_s1)
        except Exception as e:  # noqa: BLE001 — may OOM at large B*S
            print(f"stage1 remat dots: failed ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)

    if which in ("all", "s1nr"):
        try:
            s1_nr = TrainConfig(output_dir="/tmp/mfu_s1nr",
                                freeze_backbone=True,
                                tune_mm_mlp_adapter=True,
                                gradient_checkpointing=False)
            run_recipe("stage1 remat off", cfg, make_params, s1_nr,
                       batch, t_null, f_s1)
        except Exception as e:  # noqa: BLE001 — expected OOM path
            print(f"stage1 remat off: failed ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)

    if which in ("all", "lora"):
        try:
            lora = TrainConfig(output_dir="/tmp/mfu_lora", lora=True,
                               tune_mm_mlp_adapter=True,
                               gradient_checkpointing=True)
            run_recipe("stage2 lora r16 ", cfg, make_params, lora,
                       batch, t_null, f_lora, lora=True)
        except Exception as e:  # noqa: BLE001
            print(f"stage2 lora: failed ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)

    if which == "lorand":   # ablation: adapter GEMMs without dropout RNG
        lora = TrainConfig(output_dir="/tmp/mfu_lora0", lora=True,
                           lora_dropout=0.0, tune_mm_mlp_adapter=True,
                           gradient_checkpointing=True)
        run_recipe("stage2 lora nodrop", cfg, make_params, lora,
                   batch, t_null, f_lora, lora=True)

    if which == "loradots":  # lora + dots remat
        lora = TrainConfig(output_dir="/tmp/mfu_lorad", lora=True,
                           tune_mm_mlp_adapter=True,
                           gradient_checkpointing="dots")
        run_recipe("stage2 lora dots ", cfg, make_params, lora,
                   batch, t_null, f_lora, lora=True)


if __name__ == "__main__":
    main()
