"""Multi-chip (tensor-parallel) inference on the virtual CPU mesh:
sharded engine output must equal single-device output token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import valley
from valley_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(11), dtype=jnp.float32)


def _gen(engine, prompt, images=None, n=6):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False)
    return [int(t[0]) for t in engine.generate_tokens(
        [prompt], images, gen, eos_ids=[-1])]


@pytest.mark.parametrize("mesh_shape", [(1, 1, 2), (1, 2, 2), (1, 1, 4)])
def test_tp_inference_matches_single_device(cfg, params, mesh_shape):
    prompt = list(range(10, 40))
    base_engine = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                        cache_dtype=jnp.float32, use_flash=False)
    expect = _gen(base_engine, prompt)

    mesh = create_mesh(*mesh_shape)
    sharded_engine = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                            cache_dtype=jnp.float32, use_flash=False,
                            mesh=mesh)
    wq = sharded_engine.params["llama"]["layers"]["wq"]
    assert wq.sharding.spec == jax.sharding.PartitionSpec(
        None, "model", "fsdp")
    got = _gen(sharded_engine, prompt)
    assert got == expect, (got, expect)


def test_tp_multimodal_inference(cfg, params):
    tok = cfg.tokens
    p, t = cfg.num_patches, 2
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    prompt = [1] + span + list(range(10, 20))
    images = np.random.default_rng(0).standard_normal(
        (1, t, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(
        np.float32)

    base = Engine(cfg, params, buckets=(64,), max_new_tokens=6,
                  cache_dtype=jnp.float32, use_flash=False)
    expect = _gen(base, prompt, images, n=4)

    mesh = create_mesh(1, 2, 4)
    sharded = Engine(cfg, params, buckets=(64,), max_new_tokens=6,
                     cache_dtype=jnp.float32, use_flash=False, mesh=mesh)
    got = _gen(sharded, prompt, images, n=4)
    assert got == expect


def test_tp_speculative_matches_single_device(cfg, params):
    """Speculative rounds under tensor parallelism: TP spec greedy must
    equal single-device plain greedy token-for-token."""
    from valley_tpu.inference.speculative import SpecConfig, SpecDecoder

    prompt = [7, 8, 9, 7, 8, 9, 7, 8] + list(range(10, 30))
    base = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                  cache_dtype=jnp.float32, use_flash=False)
    expect = _gen(base, prompt, n=8)

    mesh = create_mesh(1, 2, 2)
    sharded = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                     cache_dtype=jnp.float32, use_flash=False, mesh=mesh)
    dec = SpecDecoder(sharded, SpecConfig(draft_len=4, rounds_per_call=2))
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    got = list(dec.generate_tokens(prompt, None, gen, eos_ids=[-1]))
    assert got == expect, (got, expect)
