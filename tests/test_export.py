"""Full-model HF export: our trained params -> reference-layout checkpoint
dir, verified by loading it back through BOTH our loader and the actual
reference model class."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from valley_tpu import config as C
from valley_tpu.models import valley
from valley_tpu.utils import hf_bridge


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny(patch_pooling_method="temporal_transformer")


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(9), dtype=jnp.float32)


@pytest.fixture(scope="module")
def exported(cfg, params, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "ckpt")
    hf_bridge.export_valley_checkpoint(cfg, params, out)
    return out


def test_roundtrip_through_our_converters(cfg, params, exported):
    sd = hf_bridge.read_state_dict(exported)
    llama2 = hf_bridge.convert_llama(sd, cfg.text, jnp.float32)
    vis2 = hf_bridge.convert_clip(
        {k[len("model.vision_tower."):]: v for k, v in sd.items()
         if k.startswith("model.vision_tower.")}, cfg.vision, jnp.float32)
    proj2 = hf_bridge.convert_projector(sd, jnp.float32)
    temp2 = hf_bridge.convert_temporal(sd, cfg, jnp.float32)
    params2 = {"llama": llama2, "vision": vis2, "projector": proj2,
               "temporal": temp2}

    ids = np.random.default_rng(0).integers(5, 400, (1, 24))
    tok = cfg.tokens
    p, t = cfg.num_patches, 2
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    ids[0, 2:2 + len(span)] = span
    frames = np.random.default_rng(1).standard_normal(
        (1, t, 3, 28, 28)).astype(np.float32)

    a = valley.forward(params, cfg, jnp.asarray(ids), jnp.asarray(frames))
    b = valley.forward(params2, cfg, jnp.asarray(ids), jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_reference_class_loads_export(cfg, params, exported):
    """The ACTUAL reference ValleyLlamaForCausalLM must load our exported
    state dict (proving reference users can consume our checkpoints)."""
    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        pytest.skip("reference not mounted")
    # reuse the stub machinery from the parity tests
    from tests.test_reference_parity import _stub
    import types

    _stub("decord", VideoReader=None, cpu=None,
          bridge=types.SimpleNamespace(set_bridge=lambda *_: None))
    _stub("torchvision", transforms=types.SimpleNamespace(
        Compose=lambda *a, **k: None))
    _stub("torchvision.transforms", Compose=lambda *a, **k: None)
    _stub("skimage", transform=None)
    _stub("skimage.transform", resize=None, rotate=None)
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)

    from valley.model.valley_model import ValleyConfig, ValleyLlamaForCausalLM
    from safetensors.torch import load_file

    ref_cfg = ValleyConfig(
        vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.intermediate_size,
        num_hidden_layers=cfg.text.num_hidden_layers,
        num_attention_heads=cfg.text.num_attention_heads,
        max_position_embeddings=cfg.text.max_position_embeddings,
        rms_norm_eps=cfg.text.rms_norm_eps,
        attn_implementation="eager")
    model = ValleyLlamaForCausalLM(ref_cfg).eval()
    # attach the tiny tower/projector modules so keys exist, then load
    vis_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        attn_implementation="eager")
    inner = model.get_model()
    inner.vision_tower = transformers.CLIPVisionModel(vis_cfg)
    inner.mm_projector = torch.nn.Linear(32, 64)
    enc_layer = torch.nn.TransformerEncoderLayer(d_model=64, nhead=8,
                                                 batch_first=True)
    inner.transformer_delta_encoder = torch.nn.TransformerEncoder(
        enc_layer, num_layers=1)
    inner.position_matrix = torch.nn.Parameter(
        torch.zeros(2048, 64), requires_grad=False)
    inner.patch_pooling_method = "temporal_transformer"

    sd = load_file(os.path.join(exported, "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # transforemr_adding_layer is the constructor template of the encoder
    # (shared weights); rotary tables are non-persistent buffers
    blockers = [k for k in missing
                if "rotary_emb" not in k and "adding_layer" not in k]
    assert not blockers, blockers
    assert not unexpected, unexpected

    # text-only logit equality vs our stack
    ids = np.random.default_rng(3).integers(5, 400, (1, 16))
    with torch.no_grad():
        ref_logits = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(valley.forward(params, cfg, jnp.asarray(ids)))
    assert np.max(np.abs(ours - ref_logits)) < 1e-3
