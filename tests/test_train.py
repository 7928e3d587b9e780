"""Training: sharded step on the 8-device CPU mesh, freezing semantics,
LoRA, schedule, checkpoint save/resume."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.data.dataset import DataCollatorForSupervisedDataset, DataLoader
from valley_tpu.models import valley
from valley_tpu.parallel import create_mesh, shard_params
from valley_tpu.parallel.sharding import param_specs
from valley_tpu.train import lora as lora_lib
from valley_tpu.train.trainer import (TrainConfig, Trainer, label_params,
                                      make_optimizer)


class FakeDataset:
    """Synthetic supervised samples (text-only + video-like)."""

    def __init__(self, cfg, n=8, seq=32, frames=2):
        self.items = []
        rng = np.random.default_rng(0)
        tok = cfg.tokens
        p = cfg.num_patches
        for i in range(n):
            ids = rng.integers(5, 400, size=seq)
            if i % 2 == 0:
                span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
                    [tok.vi_start] + [tok.vi_frame] * frames + [tok.vi_end]
                ids[1:1 + len(span)] = span
                image = rng.standard_normal(
                    (frames, 3, cfg.vision.image_size,
                     cfg.vision.image_size)).astype(np.float32)
            else:
                image = np.zeros((1, 3, cfg.vision.image_size,
                                  cfg.vision.image_size), np.float32)
            labels = ids.copy()
            labels[:seq // 2] = -100
            self.items.append(dict(input_ids=ids, labels=labels,
                                   image=image))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def make_loader(cfg, batch=4):
    ds = FakeDataset(cfg)
    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=16)
    return DataLoader(ds, batch, coll, seed=0)


def test_mesh_and_param_sharding(params):
    mesh = create_mesh(data=1, fsdp=4, model=2)
    assert mesh.devices.shape == (1, 4, 2)
    sharded = shard_params(mesh, params)
    wq = sharded["llama"]["layers"]["wq"]
    assert wq.sharding.spec == jax.sharding.PartitionSpec(
        None, "model", "fsdp")
    # every param leaf got a spec
    specs = param_specs(params)
    assert jax.tree.structure(specs, is_leaf=lambda x: isinstance(
        x, jax.sharding.PartitionSpec)) == jax.tree.structure(params)


def test_label_params_stage1(cfg, params):
    tc = TrainConfig(freeze_backbone=True, tune_mm_mlp_adapter=True)
    labels = label_params(params, tc)
    assert labels["projector"]["w"] == "base"
    assert labels["llama"]["embed"] == "base"       # input embeds trainable
    assert labels["llama"]["lm_head"] == "frozen"   # output embeds frozen
    assert labels["llama"]["layers"]["wq"] == "frozen"
    assert all(v == "frozen" for v in jax.tree.leaves(labels["vision"]))


def test_label_params_lora(cfg, params):
    p = lora_lib.add_lora(params, jax.random.key(1), r=4, dtype=jnp.float32)
    tc = TrainConfig(lora=True, tune_mm_mlp_adapter=True)
    labels = label_params(p, tc)
    assert labels["llama"]["layers"]["wq"] == "frozen"
    assert labels["llama"]["layers"]["wq_lora_a"] == "lora"
    assert labels["projector"]["w"] == "base"


def test_lora_zero_init_preserves_forward(cfg, params):
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 400, (1, 16)))
    base = valley.forward(params, cfg, ids)
    p = lora_lib.add_lora(params, jax.random.key(1), r=4, dtype=jnp.float32)
    with_lora = valley.forward(p, cfg, ids)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               atol=1e-5)


def test_lora_merge_matches_runtime_delta(cfg, params):
    p = lora_lib.add_lora(params, jax.random.key(1), r=4, dtype=jnp.float32)
    # make B nonzero so the delta is active
    p["llama"]["layers"]["wq_lora_b"] = jax.random.normal(
        jax.random.key(2), p["llama"]["layers"]["wq_lora_b"].shape) * 0.02
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 400, (1, 16)))
    runtime = valley.forward(p, cfg, ids)
    merged = lora_lib.merge_lora(p)
    assert "wq_lora_a" not in merged["llama"]["layers"]
    static = valley.forward(merged, cfg, ids)
    np.testing.assert_allclose(np.asarray(runtime), np.asarray(static),
                               atol=2e-4)


def test_lora_dropout_deterministic_and_train_only(cfg, params):
    """peft lora_dropout parity: applied only when an rng is passed (train),
    deterministic per key, identity at rate 0 / rng None (eval)."""
    p = lora_lib.add_lora(params, jax.random.key(1), r=4, dtype=jnp.float32)
    layers = dict(p["llama"]["layers"])
    for k in list(layers):
        if k.endswith("_lora_b"):
            layers[k] = jnp.ones_like(layers[k]) * 0.01
    p["llama"] = dict(p["llama"], layers=layers)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 400, (1, 16)))
    batch = {"input_ids": ids, "labels": jnp.where(ids > 4, ids, -100)}

    base = float(valley.loss_fn(p, cfg, batch, remat=False))
    d1 = float(valley.loss_fn(p, cfg, batch, remat=False,
                              lora_rng=jax.random.key(7), lora_dropout=0.5))
    d2 = float(valley.loss_fn(p, cfg, batch, remat=False,
                              lora_rng=jax.random.key(7), lora_dropout=0.5))
    d3 = float(valley.loss_fn(p, cfg, batch, remat=False,
                              lora_rng=jax.random.key(8), lora_dropout=0.5))
    off = float(valley.loss_fn(p, cfg, batch, remat=False,
                               lora_rng=jax.random.key(7), lora_dropout=0.0))
    assert d1 == d2               # same key -> same mask
    assert d1 != base and d1 != d3
    assert off == base            # rate 0 == no dropout


def test_lora_dropout_rbg_impl_deterministic(cfg, params):
    """The trainer's default dropout PRNG ("rbg", the TPU hardware bit
    generator) produces masks deterministic per key within a process and
    distinct across keys — the property the per-step fold_in relies on."""
    p = lora_lib.add_lora(params, jax.random.key(1), r=4,
                          dtype=jnp.float32)
    layers = dict(p["llama"]["layers"])
    for k in list(layers):
        if k.endswith("_lora_b"):   # B inits to 0 -> make dropout visible
            layers[k] = jnp.ones_like(layers[k]) * 0.01
    p["llama"] = dict(p["llama"], layers=layers)
    ids = jnp.asarray(np.random.default_rng(2).integers(5, 400, (1, 16)))
    batch = {"input_ids": ids, "labels": jnp.where(ids > 4, ids, -100)}

    def loss(seed):
        rng = jax.random.fold_in(jax.random.key(seed, impl="rbg"), 3)
        return float(valley.loss_fn(p, cfg, batch, remat=False,
                                    lora_rng=rng, lora_dropout=0.5))

    base = float(valley.loss_fn(p, cfg, batch, remat=False))
    assert loss(7) == loss(7)       # deterministic per (seed, step)
    assert loss(7) != loss(8)       # keys decorrelate
    assert loss(7) != base          # dropout actually applied


@pytest.mark.parametrize("policy", [True, "dots"])
def test_remat_policies_match_no_remat_grads(cfg, params, policy):
    """Both checkpoint policies are numerics-preserving: loss and grads
    equal the un-rematerialized backward (fp32 params on CPU -> exact up
    to reduction order)."""
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(5, 400, (2, 16)))
    batch = {"input_ids": ids, "labels": jnp.where(ids > 4, ids, -100)}

    def lg(remat):
        return jax.value_and_grad(
            lambda p: valley.loss_fn(p, cfg, batch, remat=remat))(params)

    l0, g0 = lg(False)
    l1, g1 = lg(policy)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        g0, g1)


def test_remat_policy_unknown_rejected(cfg, params):
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 400, (1, 8)))
    batch = {"input_ids": ids, "labels": ids}
    with pytest.raises(ValueError, match="remat policy"):
        valley.loss_fn(params, cfg, batch, remat="everything")


def test_linear_schedule_warmup_ramps_from_zero():
    tc = TrainConfig(learning_rate=1e-2, lr_scheduler_type="linear",
                     warmup_ratio=0.1)
    from valley_tpu.train.trainer import make_schedule

    sched = make_schedule(tc, total_steps=100)
    assert float(sched(0)) < 1e-3 * 1e-2          # starts ~0
    assert abs(float(sched(10)) - 1e-2) < 1e-6    # peak at warmup end
    assert float(sched(5)) == pytest.approx(5e-3, rel=1e-3)  # mid-ramp
    assert float(sched(55)) == pytest.approx(5e-3, rel=1e-3)  # mid-decay
    assert float(sched(100)) < 1e-6


def test_train_loop_loss_decreases(cfg, params, tmp_path):
    tc = TrainConfig(output_dir=str(tmp_path / "out"), learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=3, per_device_train_batch_size=4,
                     gradient_checkpointing=False, save_steps=0,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2)
    loader = make_loader(cfg)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    first_loss, last_loss = None, None
    trainer.train(resume=False)
    with open(trainer._metrics_path) as f:
        lines = [eval(line.replace("null", "None")) for line in f]
    first_loss, last_loss = lines[0]["loss"], lines[-1]["loss"]
    assert last_loss < first_loss, (first_loss, last_loss)


def test_frozen_params_unchanged_after_step(cfg, params, tmp_path):
    tc = TrainConfig(output_dir=str(tmp_path / "out2"), learning_rate=1e-2,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=1, per_device_train_batch_size=8,
                     gradient_checkpointing=False, save_steps=0,
                     mesh_data=1, mesh_fsdp=8, mesh_model=1)
    loader = make_loader(cfg, batch=8)
    p0 = jax.tree.map(jnp.copy, params)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    trainer.train(resume=False)
    final = jax.device_get(trainer.state.params)
    np.testing.assert_array_equal(np.asarray(final["llama"]["layers"]["wq"]),
                                  np.asarray(p0["llama"]["layers"]["wq"]))
    np.testing.assert_array_equal(np.asarray(final["llama"]["lm_head"]),
                                  np.asarray(p0["llama"]["lm_head"]))
    assert not np.array_equal(np.asarray(final["projector"]["w"]),
                              np.asarray(p0["projector"]["w"]))


def test_checkpoint_save_and_resume(cfg, params, tmp_path):
    out = str(tmp_path / "ckpt")
    tc = TrainConfig(output_dir=out, learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=1, per_device_train_batch_size=4,
                     gradient_checkpointing=False, save_steps=1,
                     save_total_limit=2,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2)
    loader = make_loader(cfg)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    steps = trainer.train(resume=False)
    assert steps == 2  # 8 samples / batch 4
    ckpts = os.listdir(out)
    assert "checkpoint-2" in ckpts

    # a fresh trainer resumes at the saved step
    trainer2 = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    resumed = trainer2.maybe_resume()
    assert resumed == 2
    np.testing.assert_allclose(
        np.asarray(jax.device_get(trainer2.state.params["projector"]["w"])),
        np.asarray(jax.device_get(trainer.state.params["projector"]["w"])),
        rtol=1e-6)


def test_async_checkpointing_roundtrip(cfg, params, tmp_path):
    """async_checkpointing=True: saves overlap training, every
    checkpoint still commits, and resume restores identical params."""
    from valley_tpu.utils import checkpoint as ckpt_lib

    out = str(tmp_path / "async_ckpt")
    tc = TrainConfig(output_dir=out, learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=1, per_device_train_batch_size=4,
                     gradient_checkpointing=False, save_steps=1,
                     save_total_limit=2, async_checkpointing=True,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2)
    loader = make_loader(cfg)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    steps = trainer.train(resume=False)
    assert steps == 2
    assert not ckpt_lib._pending        # final save blocked + finalized
    assert "checkpoint-2" in os.listdir(out)
    assert not any(n.endswith(".tmp") for n in os.listdir(out))

    trainer2 = Trainer(cfg, tc, jax.tree.map(jnp.copy, params), loader)
    assert trainer2.maybe_resume() == 2
    np.testing.assert_allclose(
        np.asarray(jax.device_get(trainer2.state.params["projector"]["w"])),
        np.asarray(jax.device_get(trainer.state.params["projector"]["w"])),
        rtol=1e-6)


def test_async_save_defers_commit_until_finalize(tmp_path):
    """block=False returns with only the tmp dir on disk (readers never
    see a partial checkpoint-N); finalize_pending commits it."""
    from valley_tpu.utils import checkpoint as ckpt_lib

    out = str(tmp_path / "raw")
    os.makedirs(out)
    state = {"w": jnp.arange(8, dtype=jnp.float32)}
    ckpt_lib.save_checkpoint(out, state, 1, keep=None, block=False)
    names = os.listdir(out)
    assert "checkpoint-1" not in names  # not committed yet
    ckpt_lib.finalize_pending()
    assert "checkpoint-1" in os.listdir(out)
    restored = ckpt_lib.restore_latest(out, {"w": jnp.zeros(8)})
    assert restored is not None and restored[1] == 1
    np.testing.assert_array_equal(np.asarray(restored[0]["w"]),
                                  np.arange(8, dtype=np.float32))


def test_optimizer_multistep_accumulation(cfg, params):
    tc = TrainConfig(gradient_accumulation_steps=4)
    tx, _sched, _labels = make_optimizer(params, tc, total_steps=10)
    state = tx.init(params)
    assert state is not None


def test_crash_mid_training_then_resume_completes(cfg, params, tmp_path):
    """Fault injection: the loader raises mid-epoch (simulated host crash);
    a fresh Trainer auto-resumes from the last checkpoint and finishes the
    run (reference only has auto-resume, `train.py:197-202` — this proves
    ours end-to-end)."""
    out = str(tmp_path / "crash")
    tc = TrainConfig(output_dir=out, learning_rate=1e-3,
                     freeze_backbone=True, tune_mm_mlp_adapter=True,
                     num_train_epochs=1, per_device_train_batch_size=4,
                     gradient_checkpointing=False, save_steps=1,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2)

    class CrashingLoader:
        def __init__(self, inner, crash_after):
            self.inner, self.crash_after = inner, crash_after

        def __len__(self):
            return len(self.inner)

        def epoch(self, i):
            for n, b in enumerate(self.inner.epoch(i)):
                if n == self.crash_after:
                    raise RuntimeError("injected crash")
                yield b

    base_loader = make_loader(cfg)            # 8 samples / batch 4 = 2 steps
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params),
                      CrashingLoader(base_loader, crash_after=1))
    with pytest.raises(RuntimeError, match="injected crash"):
        trainer.train(resume=False)
    assert os.path.isdir(os.path.join(out, "checkpoint-1"))

    trainer2 = Trainer(cfg, tc, jax.tree.map(jnp.copy, params),
                       make_loader(cfg))
    steps = trainer2.train(resume=True)       # resumes at 1, finishes 2
    assert steps == 2
    assert os.path.isdir(os.path.join(out, "checkpoint-2"))


def test_lora_training_with_adapter_snapshots(cfg, params, tmp_path):
    out = str(tmp_path / "lora_out")
    tc = TrainConfig(output_dir=out, learning_rate=1e-3, lora=True,
                     lora_r=4, lora_save_strategy="steps",
                     tune_mm_mlp_adapter=True, num_train_epochs=1,
                     per_device_train_batch_size=8,
                     gradient_checkpointing=False, save_steps=1,
                     mesh_data=1, mesh_fsdp=8, mesh_model=1)
    p = lora_lib.add_lora(jax.tree.map(jnp.copy, params),
                          jax.random.key(3), r=4, dtype=jnp.float32)
    loader = make_loader(cfg, batch=8)
    trainer = Trainer(cfg, tc, p, loader)
    base_wq = np.asarray(params["llama"]["layers"]["wq"])
    trainer.train(resume=False)
    final = jax.device_get(trainer.state.params)
    # base frozen, adapters moved
    np.testing.assert_array_equal(
        np.asarray(final["llama"]["layers"]["wq"]), base_wq)
    assert np.abs(np.asarray(
        final["llama"]["layers"]["wq_lora_b"])).sum() > 0
    assert any(d.startswith("adapter-") for d in os.listdir(out))


def test_opt_state_sharded_at_init(cfg, params, tmp_path):
    """The optimizer state must be mesh-sharded AT INIT, not only after
    step 1: optax inits use just the shapes of their argument, so
    without explicit out_shardings XLA DCEs the sharded inputs and
    places the whole state on ONE device — at 7B that is ~27 GB of Adam
    moments on a 16 GB chip, an init-time OOM that tiny-shape dryruns
    never see (regression: parallel/sharding.opt_state_shardings)."""
    from jax.sharding import NamedSharding

    tc = TrainConfig(output_dir=str(tmp_path / "out"),
                     freeze_backbone=False, tune_mm_mlp_adapter=True,
                     gradient_checkpointing=False, save_steps=0,
                     mesh_data=1, mesh_fsdp=4, mesh_model=2)
    trainer = Trainer(cfg, tc, jax.tree.map(jnp.copy, params),
                      make_loader(cfg))
    pshard = {
        jax.tree_util.keystr(path): leaf.sharding
        for path, leaf in
        jax.tree_util.tree_leaves_with_path(trainer.state.params)}
    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            trainer.state.opt_state):
        if not hasattr(leaf, "sharding") or leaf.ndim < 2:
            continue
        assert isinstance(leaf.sharding, NamedSharding), \
            (jax.tree_util.keystr(path), leaf.sharding)
        # moments shard exactly like the param they mirror
        for pk, psh in pshard.items():
            if jax.tree_util.keystr(path).endswith(pk):
                assert leaf.sharding == psh, (pk, leaf.sharding, psh)
                checked += 1
                break
    assert checked >= 10, checked   # the big moment tensors were seen
