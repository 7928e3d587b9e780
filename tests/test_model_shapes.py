"""Shape/dtype/grad sanity for the model stack on CPU jax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.models import clip_vit, llama, temporal, valley


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def _fake_batch(cfg, batch=2, seq=48, frames=3):
    tok = cfg.tokens
    p = cfg.num_patches  # 4 for the tiny config
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 400, size=(batch, seq))
    # Lay out: <im_start> P*<im_patch> <im_end> <vi_start> T*<vi_frame> <vi_end>
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * frames + [tok.vi_end]
    ids[:, 3:3 + len(span)] = span
    images = rng.standard_normal(
        (batch, frames, 3, cfg.vision.image_size, cfg.vision.image_size))
    return (jnp.asarray(ids), jnp.asarray(images, jnp.float32),
            jnp.ones((batch, seq), jnp.int32))


def test_clip_encode_shape(cfg, params):
    x = jnp.ones((2, 3, cfg.vision.image_size, cfg.vision.image_size))
    out = clip_vit.encode(params["vision"], cfg.vision, x)
    assert out.shape == (2, 1 + cfg.num_patches, cfg.vision.hidden_size)


def test_clip_select_layer_skips_last_layers(cfg, params):
    """Tap -2 must differ from the full stack (last layer is skipped)."""
    x = jax.random.normal(jax.random.key(1),
                          (1, 3, cfg.vision.image_size,
                           cfg.vision.image_size))
    tapped = clip_vit.encode(params["vision"], cfg.vision, x, select_layer=-2)
    full = clip_vit.encode(params["vision"], cfg.vision, x, select_layer=-1)
    assert not np.allclose(np.asarray(tapped), np.asarray(full))


@pytest.mark.parametrize("method", ["mean", "max", "temporal_importance",
                                    "temporal_transformer"])
def test_temporal_pooling_shapes(cfg, method):
    cfg2 = cfg.replace(patch_pooling_method=method)
    tparams = temporal.init_params(cfg2, jax.random.key(0), jnp.float32)
    x = jax.random.normal(jax.random.key(1),
                          (5, cfg.num_patches, cfg.text.hidden_size))
    out = temporal.pool_patches(tparams, cfg2, x)
    assert out.shape == (cfg.num_patches, cfg.text.hidden_size)


def test_temporal_mean_matches_numpy(cfg):
    x = jax.random.normal(jax.random.key(1), (5, 4, 16))
    out = temporal.pool_patches({}, cfg.replace(patch_pooling_method="mean"), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean(0),
                               rtol=1e-6)


def test_sinusoidal_position_matrix_golden():
    """Golden values of the reference getPositionEncoding
    (`valley_model.py:104-111`)."""
    P = temporal.sinusoidal_position_matrix(4, 6)
    k, i = 3, 1
    denom = 10000.0 ** (2 * i / 6)
    np.testing.assert_allclose(float(P[k, 2 * i]), np.sin(k / denom),
                               rtol=1e-5)
    np.testing.assert_allclose(float(P[k, 2 * i + 1]), np.cos(k / denom),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(P[0, 1::2]), 1.0, rtol=1e-6)


def test_splice_places_features(cfg, params):
    ids, images, _mask = _fake_batch(cfg)
    feats = valley.encode_images(params, cfg, images)
    embeds = llama.embed(params["llama"], ids)
    spliced = valley.splice_embeddings(cfg, ids, embeds, feats)
    tok = cfg.tokens
    ids_np = np.asarray(ids)
    s = np.asarray(spliced)
    pooled = np.asarray(feats.pooled)
    cls = np.asarray(feats.frame_cls)
    for b in range(ids_np.shape[0]):
        patch_pos = np.where(ids_np[b] == tok.im_patch)[0]
        for i, pos in enumerate(patch_pos):
            np.testing.assert_allclose(s[b, pos], pooled[b, i % 4], rtol=1e-5)
        frame_pos = np.where(ids_np[b] == tok.vi_frame)[0]
        for j, pos in enumerate(frame_pos):
            np.testing.assert_allclose(s[b, pos], cls[b, j % 3], rtol=1e-5)
        # non-marker positions untouched
        other = [p for p in range(ids_np.shape[1])
                 if ids_np[b, p] not in (tok.im_patch, tok.vi_frame)]
        np.testing.assert_allclose(s[b, other],
                                   np.asarray(embeds)[b, other], rtol=1e-6)


def test_full_forward_and_loss(cfg, params):
    ids, images, mask = _fake_batch(cfg)
    logits = valley.forward(params, cfg, ids, images, mask)
    assert logits.shape == (2, 48, cfg.text.vocab_size)
    assert logits.dtype == jnp.float32

    labels = np.asarray(ids).copy()
    labels[:, :20] = -100
    batch = {"input_ids": ids, "images": images, "attention_mask": mask,
             "labels": jnp.asarray(labels)}
    loss = valley.loss_fn(params, cfg, batch, remat=False)
    assert np.isfinite(float(loss))


def test_gradients_flow_to_projector_not_vision(cfg, params):
    ids, images, mask = _fake_batch(cfg)
    labels = jnp.asarray(np.asarray(ids))
    batch = {"input_ids": ids, "images": images, "attention_mask": mask,
             "labels": labels}
    grads = jax.grad(lambda p: valley.loss_fn(p, cfg, batch, remat=False))(
        params)
    proj_norm = float(jnp.abs(grads["projector"]["w"]).sum())
    vis_norm = float(sum(jnp.abs(g).sum() for g in
                         jax.tree.leaves(grads["vision"])))
    assert proj_norm > 0
    assert vis_norm == 0.0  # frozen tower — stop_gradient


def test_text_only_batch(cfg, params):
    ids = jnp.asarray(np.random.default_rng(1).integers(5, 400, (2, 16)))
    logits = valley.forward(params, cfg, ids, images=None)
    assert logits.shape == (2, 16, cfg.text.vocab_size)


def test_causality(cfg, params):
    """Changing a future token must not affect earlier logits."""
    rng = np.random.default_rng(2)
    ids = rng.integers(5, 400, (1, 16))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 7) % 400 + 5
    l1 = valley.forward(params, cfg, jnp.asarray(ids))
    l2 = valley.forward(params, cfg, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))
