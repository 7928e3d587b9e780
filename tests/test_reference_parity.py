"""End-to-end multimodal logit parity vs the ACTUAL reference
implementation (/root/reference mounted read-only), run as a test oracle
with its missing heavy deps (decord, torchvision) stubbed out.

This is the BASELINE.md fidelity criterion: logits within 1e-3.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


@pytest.fixture(scope="module")
def reference_model():
    """Construct the reference ValleyLlamaForCausalLM (tiny dims) without
    network access or decord/torchvision."""
    _stub("decord", VideoReader=None, cpu=None,
          bridge=types.SimpleNamespace(set_bridge=lambda *_: None))
    _stub("torchvision", transforms=types.SimpleNamespace(
        Compose=lambda *a, **k: None, Resize=None, CenterCrop=None))
    _stub("torchvision.transforms", Compose=lambda *a, **k: None)
    _stub("cv2")
    _stub("skimage", transform=types.SimpleNamespace(resize=None,
                                                     rotate=None))
    _stub("skimage.transform", resize=None, rotate=None)
    if REF not in sys.path:
        sys.path.insert(0, REF)

    from valley.model.valley_model import (ValleyConfig,
                                           ValleyLlamaForCausalLM)

    torch.manual_seed(0)
    cfg = ValleyConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        attn_implementation="eager")
    model = ValleyLlamaForCausalLM(cfg).eval()

    vis_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        attn_implementation="eager")
    tower = transformers.CLIPVisionModel(vis_cfg).eval()
    # wire the tower + projector the way initialize_vision_modules does
    # (valley_model.py:59-103) minus the hub download
    class TolerantLinear(torch.nn.Linear):
        """The reference hardcodes dummy_image_features=zeros(256, 1024)
        (`valley_model.py:192`) regardless of mm_hidden_size — slice the
        input so the tiny 32-dim tower works; real features (32-dim) pass
        through unchanged, and the dummy contributes 0 anyway."""

        def forward(self, x):
            return super().forward(x[..., :self.in_features])

    inner = model.get_model()
    inner.vision_tower = tower
    inner.mm_projector = TolerantLinear(32, 64)
    model.config.mm_vision_select_layer = -2
    model.config.use_mm_proj = True
    model.config.mm_hidden_size = 32
    # marker token ids live on the tower config (valley_model.py:363-365)
    tower.config.im_patch_token = 500
    tower.config.im_start_token = 501
    tower.config.im_end_token = 502
    tower.config.vi_frame_token = 503
    tower.config.vi_start_token = 504
    tower.config.vi_end_token = 505
    return model


@pytest.fixture(scope="module")
def jax_equivalent(reference_model):
    from valley_tpu import config as C
    from valley_tpu.utils import hf_bridge

    cfg = C.ValleyConfig(
        text=C.TextConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4,
                          max_position_embeddings=512, rms_norm_eps=1e-6),
        vision=C.VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=14,
                              select_layer=-2),
        tokens=C.SpecialTokens(im_patch=500, im_start=501, im_end=502,
                               vi_frame=503, vi_start=504, vi_end=505),
        patch_pooling_method="mean")

    sd = reference_model.state_dict()
    inner = reference_model.get_model()
    params = {
        "llama": hf_bridge.convert_llama(
            {k: v for k, v in sd.items() if "vision_tower" not in k
             and "mm_projector" not in k}, cfg.text, jnp.float32),
        "vision": hf_bridge.convert_clip(inner.vision_tower.state_dict(),
                                         cfg.vision, jnp.float32),
        "projector": {
            "w": jnp.asarray(inner.mm_projector.weight.detach().numpy().T),
            "b": jnp.asarray(inner.mm_projector.bias.detach().numpy()),
        },
        "temporal": {},
    }
    return cfg, params


def _prompt_ids(cfg, frames, seq=64, seed=0):
    tok = cfg.tokens
    p = cfg.num_patches
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 400, size=(1, seq))
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * frames + [tok.vi_end]
    ids[0, 2:2 + len(span)] = span
    return ids


@pytest.mark.parametrize("frames", [1, 3])
def test_multimodal_forward_parity(reference_model, jax_equivalent, frames):
    cfg, params = jax_equivalent
    from valley_tpu.models import valley

    ids = _prompt_ids(cfg, frames)
    pixels = np.random.default_rng(1).standard_normal(
        (1, frames, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = reference_model(
            input_ids=torch.from_numpy(ids),
            images=torch.from_numpy(pixels)).logits.numpy()
    ours = np.asarray(valley.forward(params, cfg, jnp.asarray(ids),
                                     jnp.asarray(pixels), use_flash=False))
    diff = np.max(np.abs(ours - ref))
    assert diff < 1e-3, diff


def test_text_only_forward_parity(reference_model, jax_equivalent):
    cfg, params = jax_equivalent
    from valley_tpu.models import valley

    ids = np.random.default_rng(3).integers(5, 400, size=(1, 24))
    with torch.no_grad():
        ref = reference_model(input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(valley.forward(params, cfg, jnp.asarray(ids),
                                     use_flash=False))
    diff = np.max(np.abs(ours - ref))
    assert diff < 1e-3, diff


def test_temporal_transformer_end_to_end_parity(reference_model,
                                                jax_equivalent):
    """Full v3 (transformer-delta) multimodal forward vs the actual
    reference: wires its transformer_delta_encoder + sinusoidal position
    matrix and compares logits."""
    from valley_tpu.models.temporal import sinusoidal_position_matrix
    from valley_tpu.utils import hf_bridge

    inner = reference_model.get_model()
    torch.manual_seed(11)
    layer = torch.nn.TransformerEncoderLayer(d_model=64, nhead=8,
                                             batch_first=True)
    inner.transformer_delta_encoder = torch.nn.TransformerEncoder(
        layer, num_layers=1).eval()
    pos = np.asarray(sinusoidal_position_matrix(2048, 64))
    inner.position_matrix = torch.nn.Parameter(
        torch.from_numpy(pos.copy()), requires_grad=False)
    old_method = inner.patch_pooling_method
    inner.patch_pooling_method = "temporal_transformer"
    try:
        cfg0, params = jax_equivalent
        cfg = cfg0.replace(patch_pooling_method="temporal_transformer",
                           temporal_transformer_heads=8)
        sd = {"model.transformer_delta_encoder.layers.0." + k: v
              for k, v in inner.transformer_delta_encoder.layers[0]
              .state_dict().items()}
        params = dict(params)
        params["temporal"] = hf_bridge.convert_temporal(sd, cfg,
                                                        jnp.float32)
        params["temporal"]["position_matrix"] = jnp.asarray(pos)

        frames = 3
        ids = _prompt_ids(cfg, frames, seed=7)
        pixels = np.random.default_rng(8).standard_normal(
            (1, frames, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = reference_model(
                input_ids=torch.from_numpy(ids),
                images=torch.from_numpy(pixels)).logits.numpy()
        from valley_tpu.models import valley

        ours = np.asarray(valley.forward(params, cfg, jnp.asarray(ids),
                                         jnp.asarray(pixels),
                                         use_flash=False))
        diff = np.max(np.abs(ours - ref))
        assert diff < 1e-3, diff
    finally:
        inner.patch_pooling_method = old_method


def test_multi_span_parity(reference_model, jax_equivalent):
    """Two <im_start> spans in one sample — the reference splices the SAME
    pooled features at every span (valley_model.py:224-229)."""
    cfg, params = jax_equivalent
    from valley_tpu.models import valley

    tok = cfg.tokens
    p = cfg.num_patches
    frames = 2
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end]
    vspan = [tok.vi_start] + [tok.vi_frame] * frames + [tok.vi_end]
    rng = np.random.default_rng(5)
    ids = rng.integers(5, 400, size=(1, 40))
    ids[0, 1:1 + len(span)] = span
    ids[0, 15:15 + len(span)] = span
    ids[0, 25:25 + len(vspan)] = vspan
    pixels = rng.standard_normal((1, frames, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = reference_model(
            input_ids=torch.from_numpy(ids),
            images=torch.from_numpy(pixels)).logits.numpy()
    ours = np.asarray(valley.forward(params, cfg, jnp.asarray(ids),
                                     jnp.asarray(pixels), use_flash=False))
    diff = np.max(np.abs(ours - ref))
    assert diff < 1e-3, diff
