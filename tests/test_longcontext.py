"""Long-context extension (SURVEY §5 slot; VERDICT r3 item 6): the 4096
bucket through the engine, and linear rope position interpolation
(arXiv 2306.15595) for 2048-trained checkpoints.  The reference is
hard-capped at 2048 (`valley/configs/experiment/valley_stage1.yaml:49`,
`valley/serve/model_worker.py:92`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import llama, valley
from valley_tpu.ops.rope import rope_cos_sin


def test_rope_scaling_default_identical():
    pos = jnp.arange(64)
    c0, s0 = rope_cos_sin(pos, 16)
    c1, s1 = rope_cos_sin(pos, 16, scaling=1.0)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_rope_scaling_halves_positions_exactly():
    """Position 2k at scaling 2 lands exactly on trained position k —
    the defining property of linear interpolation."""
    k = jnp.arange(0, 512, 7)
    c2, s2 = rope_cos_sin(2 * k, 32, scaling=2.0)
    c1, s1 = rope_cos_sin(k, 32)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=0)


def test_llama_forward_scaled_positions_match():
    """Full decoder: logits at doubled positions under scaling 2 equal
    logits at the original positions unscaled (pure-function property of
    the rope path through attention)."""
    cfg = C.valley_tiny().text
    params = llama.init_params(cfg, jax.random.key(0), jnp.float32)
    ids = np.random.default_rng(0).integers(5, 400, size=(1, 24))
    pos = np.arange(24)[None]

    def logits(text_cfg, positions):
        embeds = llama.embed(params, jnp.asarray(ids))
        hidden, _ = llama.forward_hidden(
            params, text_cfg, embeds, positions=jnp.asarray(positions),
            use_flash=False)
        return np.asarray(llama.logits_from_hidden(params, hidden))

    import dataclasses

    scaled = dataclasses.replace(cfg, rope_scaling=2.0)
    np.testing.assert_allclose(logits(scaled, 2 * pos), logits(cfg, pos),
                               rtol=0, atol=1e-5)


def test_engine_4096_bucket_beyond_reference_cap():
    """A >2048-token prompt generates through a 4096 engine bucket —
    beyond the reference's hard context cap — with a rope-scaled config."""
    cfg = C.valley_tiny()
    cfg = cfg.replace(text=__import__("dataclasses").replace(
        cfg.text, rope_scaling=2.0))
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(4096,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=4)
    prompt = np.random.default_rng(1).integers(
        5, 400, size=2600).tolist()
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    toks = [int(t[0]) for t in eng.generate_tokens([prompt], gen=gen,
                                                   eos_ids=[-1])]
    assert len(toks) == 8
    assert all(0 <= t < cfg.text.vocab_size for t in toks)


def test_worker_context_len_override():
    """--context-len raises the prompt clamp past the tokenizer's 2048
    default (serving side of the 4096 bucket)."""
    from valley_tpu.serve.model_worker import ModelWorker
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(256,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False)
    w = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                    context_len=4096)
    assert w.context_len == 4096


def test_train_yaml_rope_scaling_plumbs(tmp_path):
    """The 4k recipe's rope_scaling key reaches the model config."""
    import yaml

    from valley_tpu.train import train as train_mod

    conf = {
        "model_name_or_path": "random:tiny", "model_size": "tiny",
        "data_path": None, "output_dir": str(tmp_path / "out"),
        "fast_epoch": True, "num_train_epochs": 1,
        "per_device_train_batch_size": 1, "bf16": False,
        "model_max_length": 256, "rope_scaling": 2.0,
        "is_multimodal": False, "freeze_backbone": True,
        "tune_mm_mlp_adapter": True,
    }
    path = tmp_path / "conf.yaml"
    path.write_text(yaml.safe_dump(conf))
    model_args, data_args, tc, extra = train_mod.load_yaml_config(
        str(path))
    assert float(extra.get("rope_scaling")) == 2.0
    # and the shipped recipe carries the key
    import os

    shipped = os.path.join(os.path.dirname(train_mod.__file__), "..",
                           "configs", "experiment",
                           "valley_stage2_4k.yaml")
    got = yaml.safe_load(open(shipped))
    assert got["rope_scaling"] == 2.0
    assert got["model_max_length"] == 4096
