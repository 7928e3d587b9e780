"""Training loop: optax + pjit-sharded train step + checkpointing.

Re-designs the reference's HF `Trainer` + DeepSpeed stack
(`valley/train/train.py:180-206`, `valley/train/trainner.py`) TPU-first:

* one jitted ``train_step`` over the (data, fsdp, model) mesh — DDP and
  ZeRO fall out of the sharding rules in `valley_tpu.parallel.sharding`;
* parameter-group freezing via `optax.multi_transform` labels instead of
  `requires_grad` flags: stage-1 trains projector+input-embeddings only
  (`train.py:150-171`), stage-2 full or LoRA-only, with the separate LoRA
  lr group of `ValleyTrainer.create_optimizer` (`trainner.py:237-268`);
* cosine schedule with linear warmup (warmup_ratio semantics of the
  reference YAMLs), AdamW betas from config;
* gradient accumulation with `optax.MultiSteps`; remat on decoder blocks;
* `trainer.log` loss/lr lines (parity with `LLMCallback.on_log`,
  `trainner.py:34-49`) + jsonl metrics; orbax checkpoints with
  auto-resume (parity with `train.py:197-202`).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from valley_tpu.config import ValleyConfig
from valley_tpu.models import valley
from valley_tpu.parallel import (create_mesh, opt_state_shardings,
                                 param_shardings, shard_batch, shard_params)
from valley_tpu.utils import checkpoint as ckpt_lib
from valley_tpu.utils.profiling import StepTimer

logger = logging.getLogger(__name__)


@dataclass
class TrainConfig:
    output_dir: str = "./checkpoints"
    learning_rate: float = 2e-5
    lora_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"   # "cosine" | "linear" | "constant"
    num_train_epochs: int = 1
    per_device_train_batch_size: int = 16
    gradient_accumulation_steps: int = 1
    # True/"full": recompute whole layers in backward (minimum memory).
    # "dots": save matmul outputs, recompute only elementwise glue —
    # faster when activations fit (llama._remat_policy).  False: off.
    gradient_checkpointing: Any = True
    logging_steps: int = 1
    save_steps: int = 2400
    save_total_limit: int = 1
    # overlap checkpoint disk writes with training (orbax async save;
    # the device->host snapshot is taken synchronously so the state is
    # consistent).  The final save always blocks.
    async_checkpointing: bool = False
    seed: int = 42
    # parameter-group flags (reference train.py:58-84 semantics)
    freeze_backbone: bool = False
    tune_mm_mlp_adapter: bool = False
    freeze_mm_mlp_adapter: bool = False
    lora: bool = False
    lora_r: int = 16
    lora_alpha: int = 32
    # peft lora_dropout (reference train.py:156); applied to the adapter
    # branch input during training only
    lora_dropout: float = 0.05
    # PRNG used for the dropout masks.  "rbg" drives the TPU hardware
    # bit generator — measured 1.30x faster LoRA steps than threefry at
    # 7B B2xS512, within 1% of a no-dropout step (the masks are
    # (tokens, fan_in) per target per layer and regenerate in the remat
    # backward; see tools/exp_train_mfu.py).  Masks are deterministic
    # per (seed, step) WITHIN a fixed jax/XLA build, backend, and mesh —
    # rbg bits are not guaranteed stable across toolchain upgrades or
    # topology changes; set "threefry2x32" (jax's default splittable
    # PRNG, bit-stable everywhere) when resuming a run must reproduce
    # masks exactly across environments.
    dropout_rng_impl: str = "rbg"
    # "no" | "steps": also drop adapter-only snapshots at save_steps
    # (`LLMCallback` parity, trainner.py:51-120 / lora_save_strategy)
    lora_save_strategy: str = "no"
    # mesh
    mesh_data: int = 1
    mesh_fsdp: int = -1
    mesh_model: int = 1
    # Host-offload the optimizer state (Adam m/v) to pinned host memory —
    # the TPU-native equivalent of DeepSpeed's ZeRO-offload
    # (`valley/configs/deepspeed/config_zero3_offload.json:34-43`): the
    # state lives in host RAM and streams over PCIe around each update,
    # freeing ~2x trainable-param bytes of HBM.  The update math itself
    # stays on device (elementwise VPU work) — offloading the *compute*
    # would serialize the step on the host interconnect for no HBM win.
    offload_optimizer: bool = False
    report_to: Optional[str] = None
    run_name: str = "valley"
    # "start:stop" step range to capture a jax.profiler trace into
    # <output_dir>/trace (e.g. "5:8"); None disables
    profile_steps: Optional[str] = None
    # post-training generate-eval (stage-2 `predict_with_generate` /
    # `prediction_file_name` / `generation_max_length` keys)
    predict_with_generate: bool = False
    prediction_file_name: Optional[str] = None
    generation_max_length: int = 1536
    eval_num: int = 400
    # mid-training eval: "no" | "steps" + eval_steps (reference
    # evaluation_strategy/eval_steps keys); runs the Trainer's eval_fn
    evaluation_strategy: str = "no"
    eval_steps: int = 3000
    # also write a reference-loadable HF checkpoint at the end
    export_hf: bool = False


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# Parameter groups
# ---------------------------------------------------------------------------

def label_params(params, tc: TrainConfig):
    """Assign each leaf a label: 'frozen' | 'base' | 'lora'.

    Reproduces the reference's requires_grad logic:
    vision tower always frozen (`valley_model.py:69`); freeze_backbone
    freezes the decoder (`train.py:150-151`); tune_mm_mlp_adapter re-enables
    projector + input embeddings but NOT lm_head (`train.py:164-171`);
    freeze_mm_mlp_adapter freezes the projector (`train.py:173-176`);
    with LoRA only adapter factors (+ projector when tuned) train.
    """

    def label(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        top = keys[0]
        name = keys[-1]
        if top == "vision":
            return "frozen"
        if name.endswith("_lora_a") or name.endswith("_lora_b"):
            return "lora"
        if name == "lora_scale":
            return "frozen"
        if top == "projector":
            if tc.freeze_mm_mlp_adapter:
                return "frozen"
            if tc.tune_mm_mlp_adapter or not tc.freeze_backbone:
                return "base"
            return "frozen"
        if top == "temporal":
            return "frozen" if (tc.freeze_backbone or tc.lora) else "base"
        # llama tree
        if tc.lora:
            return "frozen"
        if tc.freeze_backbone:
            if name == "embed" and tc.tune_mm_mlp_adapter:
                return "base"   # input embeddings trainable (train.py:168)
            return "frozen"
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def make_schedule(tc: TrainConfig, total_steps: int):
    warmup = max(int(total_steps * tc.warmup_ratio), 0)
    if tc.lr_scheduler_type == "constant":
        return optax.constant_schedule(tc.learning_rate)
    if tc.lr_scheduler_type == "linear":
        # HF linear-with-warmup: ramp 0 -> lr over warmup, then lr -> 0
        return optax.join_schedules(
            [optax.linear_schedule(0.0, tc.learning_rate, max(warmup, 1)),
             optax.linear_schedule(tc.learning_rate, 0.0,
                                   max(total_steps - warmup, 1))],
            [warmup])
    return optax.warmup_cosine_decay_schedule(
        0.0, tc.learning_rate, warmup, max(total_steps, 1), end_value=0.0)


def make_optimizer(params, tc: TrainConfig, total_steps: int):
    sched = make_schedule(tc, total_steps)

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(tc.max_grad_norm),
            optax.adamw(lr, b1=tc.adam_beta1, b2=tc.adam_beta2,
                        eps=tc.adam_eps, weight_decay=tc.weight_decay),
        )

    lora_sched = sched if tc.lora_lr is None else make_schedule(
        dataclasses.replace(tc, learning_rate=tc.lora_lr), total_steps)
    labels = label_params(params, tc)
    tx = optax.multi_transform(
        {"base": adamw(sched), "lora": adamw(lora_sched),
         "frozen": optax.set_to_zero()},
        labels)
    if tc.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, tc.gradient_accumulation_steps)
    return tx, sched, labels


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    def __init__(self, cfg: ValleyConfig, tc: TrainConfig, params,
                 train_loader, total_steps: Optional[int] = None,
                 mesh=None,
                 loss_fn: Optional[Callable] = None,
                 eval_fn: Optional[Callable] = None):
        # eval_fn(params, step) -> metrics dict; invoked every eval_steps
        # when evaluation_strategy == "steps"
        self.eval_fn = eval_fn
        self.cfg = cfg
        self.tc = tc
        self.mesh = mesh or create_mesh(data=tc.mesh_data, fsdp=tc.mesh_fsdp,
                                        model=tc.mesh_model)
        self.train_loader = train_loader
        steps_per_epoch = len(train_loader)
        self.total_steps = total_steps or (
            steps_per_epoch * tc.num_train_epochs
            // max(tc.gradient_accumulation_steps, 1))
        self.tx, self.schedule, self.labels = make_optimizer(
            params, tc, self.total_steps)
        # training-time LoRA dropout: derive a deterministic per-step key
        # inside the jitted step (fold the step counter into the seed)
        self._lora_dropout = tc.lora_dropout if tc.lora else 0.0
        if loss_fn is not None:
            self._loss_fn = loss_fn
            self._lora_dropout = 0.0
        else:
            self._loss_fn = (
                lambda p, batch, lora_rng=None: valley.loss_fn(
                    p, cfg, batch, remat=tc.gradient_checkpointing,
                    lora_rng=lora_rng, lora_dropout=self._lora_dropout))

        with self.mesh:
            params = shard_params(self.mesh, params)
            # out_shardings is REQUIRED here: optax inits use only the
            # shapes of their argument, so in_shardings alone lets XLA
            # DCE the inputs and place the whole state on one device —
            # ~27 GB of Adam moments on one 16 GB chip at 7B, an
            # init-time OOM no tiny-shape dryrun catches
            # (parallel/sharding.opt_state_shardings).
            opt_state = jax.jit(
                self.tx.init,
                in_shardings=(param_shardings(self.mesh, params),),
                out_shardings=opt_state_shardings(
                    self.mesh, params,
                    jax.eval_shape(self.tx.init, params)))(params)
        self._opt_dev_sh = self._opt_host_sh = None
        if tc.offload_optimizer:
            from jax.sharding import NamedSharding, PartitionSpec

            def named(x):
                # scalar counters can come out of init committed to one
                # device; normalize everything to a mesh-wide sharding so
                # host/device copies agree with the step's device set
                sh = getattr(x, "sharding", None)
                if isinstance(sh, NamedSharding) and sh.mesh == self.mesh:
                    return sh
                return NamedSharding(self.mesh, PartitionSpec())

            self._opt_dev_sh = jax.tree.map(named, opt_state)
            self._opt_host_sh = jax.tree.map(
                lambda s: s.with_memory_kind("pinned_host"),
                self._opt_dev_sh)
            opt_state = jax.device_put(opt_state, self._opt_host_sh)
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

        if tc.offload_optimizer:
            # Split step: grads jit (opt state stays in host RAM through
            # forward/backward — the HBM peak), then an update jit over
            # device-resident state with explicit host<->device transfers
            # between them.  (In-jit memory-space annotations can't
            # partially replicate under SPMD, so the transfers live
            # outside the executables.)
            self._grad_step = jax.jit(self._grad_step_impl)
            self._update_step = jax.jit(self._update_impl,
                                        donate_argnums=(0, 1, 2))
            self._train_step = self._offload_train_step
        else:
            self._train_step = jax.jit(self._train_step_impl,
                                       donate_argnums=(0,))
        # prefetch: decode/collate/transfer the next batches while the
        # step for the current one runs on device
        from valley_tpu.data.dataset import PrefetchLoader

        if not isinstance(self.train_loader, PrefetchLoader):
            self.train_loader = PrefetchLoader(
                self.train_loader, depth=2, transform=self._device_batch)
        os.makedirs(tc.output_dir, exist_ok=True)
        self._log_path = os.path.join(tc.output_dir, "trainer.log")
        self._metrics_path = os.path.join(tc.output_dir, "metrics.jsonl")
        self._wandb = None
        if tc.report_to == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "valley"),
                    name=tc.run_name, config=dataclasses.asdict(tc))
            except ImportError:
                logger.warning("report_to=wandb but wandb is not "
                               "installed; file logging only")

    # -- jitted step -----------------------------------------------------

    def _loss_and_grads(self, params, step, batch):
        # Differentiate ONLY the trainable subtree (equinox-style
        # partition/combine with None placeholders): with freeze_backbone
        # (stage 1) this avoids materializing 13+ GB of decoder cotangents
        # that the optimizer would immediately discard.  Frozen leaves are
        # closed over; their zero updates fold away under XLA.
        labels = self.labels
        is_none = lambda x: x is None  # noqa: E731

        trainable = jax.tree.map(
            lambda p, l: p if l != "frozen" else None, params, labels)
        frozen = jax.tree.map(
            lambda p, l: p if l == "frozen" else None, params, labels)

        def loss_of(tr):
            merged = jax.tree.map(lambda t, f: f if t is None else t,
                                  tr, frozen, is_leaf=is_none)
            if self._lora_dropout > 0.0:
                rng = jax.random.fold_in(
                    jax.random.key(self.tc.seed,
                                   impl=self.tc.dropout_rng_impl), step)
                return self._loss_fn(merged, batch, rng)
            return self._loss_fn(merged, batch)

        loss, grads_tr = jax.value_and_grad(loss_of)(trainable)
        gnorm = optax.global_norm(grads_tr)  # None leaves flatten away
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p) if g is None else g,
            grads_tr, params, is_leaf=is_none)
        return loss, gnorm, grads

    def _train_step_impl(self, state: TrainState, batch):
        loss, gnorm, grads = self._loss_and_grads(state.params, state.step,
                                                  batch)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), \
            {"loss": loss, "grad_norm": gnorm}

    # -- optimizer host-offload step (TrainConfig.offload_optimizer) ------

    def _grad_step_impl(self, params, step, batch):
        return self._loss_and_grads(params, step, batch)

    def _update_impl(self, params, opt_state, grads):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _offload_train_step(self, state: TrainState, batch):
        # forward/backward with the Adam state parked in host RAM, then
        # stream it through the device just for the update
        loss, gnorm, grads = self._grad_step(state.params, state.step, batch)
        opt_dev = jax.device_put(state.opt_state, self._opt_dev_sh)
        params, opt_dev = self._update_step(state.params, opt_dev, grads)
        opt_host = jax.device_put(opt_dev, self._opt_host_sh)
        return TrainState(params, opt_host, state.step + 1), \
            {"loss": loss, "grad_norm": gnorm}

    # -- loop ------------------------------------------------------------

    def log(self, record: dict):
        line = json.dumps({k: (float(v) if hasattr(v, "item") else v)
                           for k, v in record.items()})
        with open(self._metrics_path, "a") as f:
            f.write(line + "\n")
        # parity with LLMCallback's trainer.log (`trainner.py:34-49`)
        with open(self._log_path, "a") as f:
            f.write(line + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items()
                             if isinstance(v, (int, float))})
        logger.info(line)

    def save(self, step: int, final: bool = False):
        # the end-of-training save always blocks so the trainer returns
        # with every checkpoint committed
        ckpt_lib.save_checkpoint(
            self.tc.output_dir, self.state, step,
            keep=self.tc.save_total_limit,
            block=final or not self.tc.async_checkpointing)
        if self.tc.lora and self.tc.lora_save_strategy == "steps":
            from valley_tpu.train import lora as lora_lib

            ckpt_lib.save_pytree(
                os.path.join(self.tc.output_dir, f"adapter-{step}"),
                lora_lib.split_lora(jax.device_get(self.state.params)))

    def maybe_resume(self) -> int:
        restored = ckpt_lib.restore_latest(self.tc.output_dir, self.state)
        if restored is None:
            return 0
        state, step = restored
        logger.info("resume from checkpoint-%d", step)
        # orbax restores leaves as arrays COMMITTED to single devices; a
        # committed dev-0 scalar can't mix with mesh-sharded params inside
        # jit.  Re-place every leaf on the mesh: keep NamedShardings from
        # the live state, replicate everything else.
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(self.mesh, PartitionSpec())

        def place(restored_leaf, live_leaf):
            sh = getattr(live_leaf, "sharding", None)
            if not isinstance(sh, NamedSharding):
                sh = replicated
            return jax.device_put(restored_leaf, sh)

        with self.mesh:
            state = jax.tree.map(place, state, self.state)
        self.state = state
        return step

    def train(self, resume: bool = True):
        tc = self.tc
        # `step` counts OPTIMIZER updates (HF Trainer semantics for
        # logging_steps/save_steps/eval_steps/checkpoint-N); with gradient
        # accumulation each step consumes `accum` micro-batches.
        accum = max(tc.gradient_accumulation_steps, 1)
        start_step = self.maybe_resume() if resume else 0
        step = start_step
        seen = 0
        t0 = time.time()
        prof_range = None
        if tc.profile_steps:
            lo, hi = tc.profile_steps.split(":")
            prof_range = (int(lo), int(hi))
        profiling = False
        timer = StepTimer()
        with self.mesh:
            for epoch in range(tc.num_train_epochs):
                for batch in self.train_loader.epoch(epoch):
                    seen += 1
                    if seen <= start_step * accum:
                        continue  # fast-forward through resumed data
                    if prof_range and step == prof_range[0] and not profiling:
                        jax.profiler.start_trace(
                            os.path.join(tc.output_dir, "trace"))
                        profiling = True
                    timer.start()
                    self.state, metrics = self._train_step(self.state, batch)
                    jax.block_until_ready(metrics["loss"])
                    timer.stop()
                    if seen % accum:
                        continue  # mid-accumulation micro-batch
                    step += 1
                    if profiling and step >= prof_range[1]:
                        jax.profiler.stop_trace()
                        profiling = False
                    if step % tc.logging_steps == 0:
                        dt = time.time() - t0
                        self.log({
                            "step": step,
                            "epoch": epoch,
                            "loss": float(metrics["loss"]),
                            "grad_norm": float(metrics["grad_norm"]),
                            "learning_rate": float(self.schedule(step)),
                            "seconds": round(dt, 2),
                            **{k: round(v, 4)
                               for k, v in timer.summary().items()},
                        })
                    if tc.save_steps and step % tc.save_steps == 0:
                        self.save(step)
                    if (self.eval_fn is not None
                            and tc.evaluation_strategy == "steps"
                            and tc.eval_steps
                            and step % tc.eval_steps == 0):
                        metrics = self.eval_fn(self.state.params, step)
                        if metrics:
                            self.log({"step": step,
                                      **{f"eval_{k}": v
                                         for k, v in metrics.items()}})
            if profiling:
                jax.profiler.stop_trace()
            self.save(step, final=True)
        return step

    def _device_batch(self, batch):
        # host-side arrays into shard_batch: multi-process assembly
        # (make_array_from_process_local_data) needs host data, and the
        # host-side bf16 cast halves H2D image bytes either way
        arrs = {k: np.asarray(v) for k, v in batch.items()}
        if "images" in arrs:
            arrs["images"] = arrs["images"].astype(jnp.bfloat16)
        return shard_batch(self.mesh, arrs)
