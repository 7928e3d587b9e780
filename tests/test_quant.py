"""Weight-only int8 serving quantization: accuracy and engine integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import valley
from valley_tpu.ops.quant import quantize_llama_params, quantize_tensor


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def test_quantize_tensor_roundtrip():
    # (out, in) layer layout: per-out-channel scale (out,)
    w = jax.random.normal(jax.random.key(1), (64, 48)) * 0.1
    q, scale = quantize_tensor(w)
    assert q.dtype == jnp.int8 and scale.shape == (64,)
    recon = q.astype(jnp.float32) * scale.astype(jnp.float32)[:, None]
    rel = float(jnp.abs(recon - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # per-channel int8: <1% of the channel max
    # lm_head keeps (in, out): scale (1, out)
    q2, s2 = quantize_tensor(w, contract_axis=-2)
    assert s2.shape == (1, 48)
    recon2 = q2.astype(jnp.float32) * s2.astype(jnp.float32)
    assert float(jnp.abs(recon2 - w).max() / jnp.abs(w).max()) < 0.01


def test_quantize_stacked_matches_per_layer():
    w = jax.random.normal(jax.random.key(2), (3, 16, 8))
    q_all, s_all = quantize_tensor(w)
    for i in range(3):
        q_i, s_i = quantize_tensor(w[i])
        np.testing.assert_array_equal(np.asarray(q_all[i]),
                                      np.asarray(q_i))
        np.testing.assert_allclose(np.asarray(s_all[i]), np.asarray(s_i))


def test_quantized_forward_close(cfg, params):
    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    assert qparams["llama"]["layers"]["wq"].dtype == jnp.int8
    assert qparams["llama"]["lm_head"].dtype == jnp.int8
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 400, (1, 24)))
    full = valley.forward(params, cfg, ids)
    quant = valley.forward(qparams, cfg, ids)
    # greedy choices should mostly agree on random weights; logits close
    agree = float((jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean())
    assert agree > 0.8, agree
    assert float(jnp.abs(full - quant).max()) < 0.5


def test_quantized_engine_generates(cfg, params):
    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    eng = Engine(cfg, qparams, buckets=(32,), max_new_tokens=6,
                 cache_dtype=jnp.float32, use_flash=False)
    toks = [int(t[0]) for t in eng.generate_tokens(
        [list(range(10, 25))],
        gen=GenerationConfig(max_new_tokens=4, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 4


def test_quantized_tp_inference_matches(cfg, params):
    """int8 + tensor parallelism composes: scales follow the model axis."""
    from valley_tpu.parallel import create_mesh

    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    base = Engine(cfg, jax.tree.map(jnp.copy, qparams), buckets=(32,),
                  max_new_tokens=6, cache_dtype=jnp.float32,
                  use_flash=False)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    expect = [int(t[0]) for t in base.generate_tokens(
        [list(range(10, 25))], gen=gen, eos_ids=[-1])]
    sharded = Engine(cfg, qparams, buckets=(32,), max_new_tokens=6,
                     cache_dtype=jnp.float32, use_flash=False,
                     mesh=create_mesh(1, 2, 2))
    got = [int(t[0]) for t in sharded.generate_tokens(
        [list(range(10, 25))], gen=gen, eos_ids=[-1])]
    assert got == expect


def test_int4gpa8_tp_inference_matches(cfg, params):
    """Grouped W4A8 + nibble-packed storage + tensor parallelism compose:
    the (L, out, G) grouped a8 scales follow their weight's model axis
    (the rank-2 scale spec replicates the trailing group dim), the
    packed uint8 tree unpacks inside sharded executables, and a 128-wide
    prefill engages the W4A8 dot under the mesh."""
    from valley_tpu.ops.quant import pack_int4_params
    from valley_tpu.parallel import create_mesh

    gsize = cfg.text.hidden_size // 2
    q = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4,
                              group_size=gsize, act8=True)
    q = pack_int4_params(q)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    prompt = list(range(10, 25))
    base = Engine(cfg, jax.tree.map(jnp.copy, q), buckets=(128,),
                  max_new_tokens=6, cache_dtype=jnp.float32,
                  use_flash=False, w4_packed=True)
    expect = [int(t[0]) for t in base.generate_tokens(
        [prompt], gen=gen, eos_ids=[-1])]
    sharded = Engine(cfg, q, buckets=(128,), max_new_tokens=6,
                     cache_dtype=jnp.float32, use_flash=False,
                     w4_packed=True, mesh=create_mesh(1, 2, 2))
    got = [int(t[0]) for t in sharded.generate_tokens(
        [prompt], gen=gen, eos_ids=[-1])]
    assert got == expect


def test_quantized_chat_session_matches_reprefill(cfg, params):
    """int8 + multi-turn KV reuse compose."""
    from valley_tpu.inference.engine import ChatSession

    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    eng = Engine(cfg, qparams, buckets=(64,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    sess = ChatSession(eng, gen)
    r1 = sess.chat(list(range(10, 30)), eos_ids=[-1])
    r2 = sess.chat([50, 51, 52], eos_ids=[-1])
    conversation = list(range(10, 30)) + r1 + [50, 51, 52]
    expect = [int(t[0]) for t in eng.generate_tokens(
        [conversation], gen=gen, eos_ids=[-1])]
    assert r2 == expect


def test_quantize_idempotent(cfg, params):
    q1 = quantize_llama_params(jax.tree.map(jnp.copy, params))
    q2 = quantize_llama_params(q1)  # already int8 -> no-op
    assert q2["llama"]["layers"]["wq"].dtype == jnp.int8


def test_quantize_bits4_roundtrip():
    from valley_tpu.ops.quant import quantize_tensor

    w = jax.random.normal(jax.random.key(0), (32, 48)) * 0.1
    q, scale = quantize_tensor(w, bits=4)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q))) <= 7
    deq = q.astype(jnp.float32) * scale.astype(jnp.float32)[:, None]
    # int4 per-channel: ~1/14 of the channel absmax worst case
    err = jnp.max(jnp.abs(deq - w) / jnp.max(jnp.abs(w), axis=1,
                                             keepdims=True))
    assert float(err) <= 1 / 14 + 1e-3


def test_decode_w4_token_identical_to_int8_storage(cfg, params):
    """bits=4 params: the in-executable int4 view is numerically exact,
    so decode_w4=True must match decode_w4=False token-for-token."""
    q4 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4)
    gen = GenerationConfig(max_new_tokens=10, do_sample=False)
    outs = []
    for w4 in (False, True):
        eng = Engine(cfg, q4, buckets=(64,), max_new_tokens=10,
                     cache_dtype=jnp.float32, use_flash=False,
                     steps_per_call=4, decode_w4=w4)
        outs.append([int(t[0]) for t in eng.generate_tokens(
            [list(range(10, 30))], gen=gen, eos_ids=[-1])])
    assert outs[0] == outs[1], outs


def test_bits4_forward_close(cfg, params):
    """4-bit weights still produce usable logits on the tiny model
    (loose bound; per-channel symmetric without group scales)."""
    from valley_tpu.models import llama as llama_mod

    q4 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4)
    x = jnp.asarray([[5, 6, 7, 8]])
    ref = llama_mod.forward(params["llama"], cfg.text,
                            llama_mod.embed(params["llama"], x))
    got = llama_mod.forward(q4["llama"], cfg.text,
                            llama_mod.embed(q4["llama"], x))
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.5, rel


def test_decode_w4_composes_with_speculative(cfg, params):
    from valley_tpu.inference.speculative import SpecConfig, SpecDecoder

    q4 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4)
    gen = GenerationConfig(max_new_tokens=10, do_sample=False)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8] + list(range(10, 24))
    outs = []
    for w4 in (False, True):
        eng = Engine(cfg, q4, buckets=(64,), max_new_tokens=10,
                     cache_dtype=jnp.float32, use_flash=False,
                     steps_per_call=4, decode_w4=w4)
        dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
        outs.append(list(dec.generate_tokens(prompt, None, gen,
                                             eos_ids=[-1])))
    assert outs[0] == outs[1], outs


def test_decode_w4_composes_with_continuous(cfg, params):
    from valley_tpu.inference.continuous import ContinuousEngine, _drain

    q4 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4)
    eng = Engine(cfg, q4, buckets=(64,), max_new_tokens=10,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=2, decode_w4=True)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    expect = [int(t[0]) for t in eng.generate_tokens(
        [list(range(10, 30))], gen=gen, eos_ids=[-1])]
    ce = ContinuousEngine(eng, rows=2, bucket=64, extra_slots=32,
                          steps_per_call=2)
    got = list(_drain(ce.submit(list(range(10, 30)), max_new_tokens=6,
                                eos_id=-1)))
    assert got == expect, (got, expect)


def test_bits4_group_scales_reduce_error():
    from valley_tpu.ops.quant import quantize_tensor

    w = jax.random.normal(jax.random.key(1), (16, 256)) * \
        (1.0 + jnp.arange(256) / 64.0)   # per-group magnitude variation

    def err(q, scale, grouped):
        if grouped:
            g = scale.shape[-1]
            deq = (q.reshape(16, g, -1).astype(jnp.float32)
                   * scale.astype(jnp.float32)[..., None]).reshape(16, 256)
        else:
            deq = q.astype(jnp.float32) * \
                scale.astype(jnp.float32)[:, None]
        return float(jnp.mean(jnp.abs(deq - w)))

    q_pc, s_pc = quantize_tensor(w, bits=4)
    q_gw, s_gw = quantize_tensor(w, bits=4, group_size=64)
    assert s_gw.shape == (16, 4)
    e_pc = err(q_pc, s_pc, False)
    e_gw = err(q_gw, s_gw, True)
    assert e_gw < e_pc * 0.75, (e_pc, e_gw)


def test_bits4_group_engine_matches_w4_view(cfg, params):
    q4 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4,
                               group_size=32)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    outs = []
    for w4 in (False, True):
        eng = Engine(cfg, q4, buckets=(64,), max_new_tokens=8,
                     cache_dtype=jnp.float32, use_flash=False,
                     steps_per_call=4, decode_w4=w4)
        outs.append([int(t[0]) for t in eng.generate_tokens(
            [list(range(10, 30))], gen=gen, eos_ids=[-1])])
    assert outs[0] == outs[1], outs


def test_decode_w4_rejects_int8_range_params(cfg, params):
    """bits=8 trees hold values in [-127, 127]; Engine(decode_w4=True)
    must refuse them instead of letting int4_decode_view silently
    truncate (ADVICE r2, medium)."""
    q8 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=8)
    with pytest.raises(ValueError, match="bits=8"):
        Engine(cfg, q8, buckets=(64,), max_new_tokens=8,
               cache_dtype=jnp.float32, use_flash=False, decode_w4=True)


def test_grouped_proj_blockdiag_matches_einsum():
    """`_proj`'s decode-shape block-diagonal GEMV (b*groups <= one MXU
    tile) and its batched grouped-einsum path are the SAME function —
    feed identical rows through both dispatch sides and compare."""
    from valley_tpu.models.llama import _proj

    k, o, group = 256, 96, 32           # g = 8 groups
    g = k // group
    w = jax.random.normal(jax.random.key(3), (o, k)) * \
        (1.0 + jnp.arange(k) / 128.0)
    q, scale = quantize_tensor(w, bits=4, group_size=group)
    assert scale.shape == (o, g)
    lp = {"p": q, "p_scale": scale}
    x1 = jax.random.normal(jax.random.key(4), (1, k), jnp.float32)
    b_big = 128 // g + 1                # smallest batch past the tile
    xb = jnp.tile(x1, (b_big, 1))
    y_fast = _proj(lp, "p", x1)         # b*g = 8  -> block-diag GEMV
    y_ein = _proj(lp, "p", xb)          # b*g > 128 -> grouped einsum
    np.testing.assert_allclose(np.asarray(y_fast[0]),
                               np.asarray(y_ein[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_ein[0]),
                               np.asarray(y_ein[-1]), rtol=0, atol=0)
    # and both dequantize correctly: error bounded by the int4 gate
    # threshold (tools/quant_report.py PASS: recon <= 12%)
    ref = x1 @ w.T
    rel = float(jnp.abs(y_fast[0] - ref[0]).max() / jnp.abs(ref).max())
    assert rel < 0.12, rel


def test_w8a8_proj_matches_manual_math():
    """The W8A8 prefill path (act8=True) computes exactly: per-token
    absmax int8 activation quant -> int8 dot (int32 accumulate is exact)
    -> fp32 rescale by token scale x out-channel weight scale."""
    from valley_tpu.models.llama import _A8_MIN_SEQ, _proj

    k, o, s = 96, 64, _A8_MIN_SEQ
    w = jax.random.normal(jax.random.key(5), (o, k)) * 0.1
    q, scale = quantize_tensor(w)
    lp = {"p": q, "p_scale_a8": scale}
    x = jax.random.normal(jax.random.key(6), (1, s, k), jnp.float32)
    y = np.asarray(_proj(lp, "p", x))

    xf = np.asarray(x, np.float32).reshape(s, k)
    amax = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-6)
    ascale = amax / 127.0
    xq = np.round(xf / ascale).astype(np.int32)
    ref = (xq @ np.asarray(q, np.int32).T).astype(np.float32) \
        * ascale * np.asarray(scale, np.float32)[None, :]
    np.testing.assert_allclose(y.reshape(s, o), ref, rtol=1e-4, atol=1e-4)
    # quality: the combined weight+activation quant error stays small
    full = xf @ np.asarray(w, np.float32).T
    rel = np.abs(y.reshape(s, o) - full).max() / np.abs(full).max()
    assert rel < 0.03, rel


def test_w8a8_below_seq_threshold_bit_identical_to_int8():
    """Decode / extension / speculative-verify chunks (sequence axis <
    _A8_MIN_SEQ) take the SAME dequant-dot an int8 tree does — bit-exact,
    so int8a8 decode output is token-identical to int8."""
    from valley_tpu.models.llama import _A8_MIN_SEQ, _proj

    k, o = 96, 64
    w = jax.random.normal(jax.random.key(7), (o, k)) * 0.1
    q, scale = quantize_tensor(w)
    x = jax.random.normal(jax.random.key(8), (4, _A8_MIN_SEQ - 1, k),
                          jnp.float32)
    y_a8 = _proj({"p": q, "p_scale_a8": scale}, "p", x)
    y_i8 = _proj({"p": q, "p_scale": scale}, "p", x)
    np.testing.assert_array_equal(np.asarray(y_a8), np.asarray(y_i8))


def test_act8_engine_below_gate_bit_identical_above_gate_engages(
        cfg, params):
    """End-to-end contract of the _A8_MIN_SEQ gate through the REAL
    engine: (1) when every chunk stays below the gate (bucket 64 < 128)
    the int8a8 engine's whole greedy generation is BIT-IDENTICAL to the
    int8 engine's — the a8 tree degenerates exactly to the dequant-dot;
    (2) at a >= 128 bucket the W8A8 prefill engages: prefill logits
    drift from int8's (close, not equal), which is why continuations
    after a W8A8 prefill are not promised bit-identical (the prefill
    also writes activation-quantized KV)."""
    i8params = quantize_llama_params(jax.tree.map(jnp.copy, params))
    a8params = quantize_llama_params(jax.tree.map(jnp.copy, params),
                                     act8=True)
    assert "wq_scale_a8" in a8params["llama"]["layers"]
    assert "wq_scale" not in a8params["llama"]["layers"]
    prompt = list(range(10, 25))
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)

    # (1) bucket 64 < _A8_MIN_SEQ: entire generation bit-identical
    def gen_tokens(p, bucket):
        eng = Engine(cfg, p, buckets=(bucket,), max_new_tokens=8,
                     cache_dtype=jnp.float32, use_flash=False)
        return [int(t[0]) for t in
                eng.generate_tokens([prompt], gen=gen, eos_ids=[-1])]

    assert gen_tokens(a8params, 64) == gen_tokens(i8params, 64)

    # (2) >= 128-wide forward: the a8 path engages (logits differ from
    # int8's but stay close), and the engine still generates
    ids = jnp.asarray(
        np.random.default_rng(0).integers(5, 400, (1, 130)))
    lg_i8 = valley.forward(i8params, cfg, ids)
    lg_a8 = valley.forward(a8params, cfg, ids)
    diff = float(jnp.abs(lg_i8 - lg_a8).max())
    assert diff > 0.0, "W8A8 path never engaged at seq 130"
    assert diff < 0.5 * float(jnp.abs(lg_i8).max()), diff
    toks = gen_tokens(a8params, 256)
    assert len(toks) == 6


def test_vision_quant_encode_close_and_specs(cfg, params):
    """quantize_vision_params: int8 (weight-only) and int8a8 towers stay
    close to the bf16 tower, and the sharding rules accept the new scale
    keys (scale (L, 1, out) follows its weight's out axis)."""
    from valley_tpu.models import clip_vit
    from valley_tpu.ops.quant import quantize_vision_params
    from valley_tpu.parallel import sharding

    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal(
        (2, 3, cfg.vision.image_size, cfg.vision.image_size)),
        jnp.float32)
    base = clip_vit.encode(params["vision"], cfg.vision, px)
    for act8 in (False, True):
        qp = quantize_vision_params(
            {"vision": jax.tree.map(jnp.copy, params["vision"])},
            act8=act8)
        lay = qp["vision"]["layers"]
        key = "fc1_scale_a8" if act8 else "fc1_scale"
        assert lay["fc1"].dtype == jnp.int8 and key in lay
        assert lay[key].shape == (lay["fc1"].shape[0], 1,
                                  lay["fc1"].shape[-1])
        out = clip_vit.encode(qp["vision"], cfg.vision, px)
        rel = float(jnp.abs(out - base).max()
                    / (jnp.abs(base).max() + 1e-9))
        assert rel < (0.25 if act8 else 0.15), (act8, rel)
        specs = sharding.vision_param_specs(qp["vision"])
        assert specs["layers"][key] == jax.sharding.PartitionSpec(
            None, None, "model")   # fc1 out axis is 'model'
        wo_key = "wo_scale_a8" if act8 else "wo_scale"
        assert specs["layers"][wo_key] == jax.sharding.PartitionSpec(
            None, None, "fsdp")    # wo out axis is 'fsdp'


def test_vision_quant_engine_video_generates(cfg, params):
    """Full engine with BOTH the LLM (int8a8) and the tower (int8a8)
    quantized generates from a video prompt."""
    from valley_tpu.ops.quant import quantize_vision_params

    qp = quantize_llama_params(jax.tree.map(jnp.copy, params), act8=True)
    qp = quantize_vision_params(qp, act8=True)
    tok = cfg.tokens
    frames = 2
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * frames + \
        [tok.vi_end]
    prompt = [1] + span + list(range(10, 20))
    px = np.random.default_rng(4).standard_normal(
        (1, frames, 3, cfg.vision.image_size,
         cfg.vision.image_size)).astype(np.float32)
    eng = Engine(cfg, qp, buckets=(128,), max_new_tokens=6,
                 cache_dtype=jnp.float32, use_flash=False)
    toks = [int(t[0]) for t in eng.generate_tokens(
        [prompt], images=px,
        gen=GenerationConfig(max_new_tokens=4, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 4


def test_act8_mode_validation():
    """act8 composes with bits=4 ONLY via grouped scales (W4A8); the two
    meaningless combinations (per-channel int4 a8, grouped int8 a8)
    reject at the quantizer."""
    import pytest as _pytest

    def tree():
        return {"llama": {"layers": {"wq": jnp.zeros((2, 8, 8))},
                          "lm_head": jnp.zeros((8, 16))}}

    with _pytest.raises(ValueError):
        quantize_llama_params(tree(), bits=4, act8=True)
    with _pytest.raises(ValueError):
        quantize_llama_params(tree(), bits=8, group_size=4, act8=True)
    ok = quantize_llama_params(tree(), bits=4, group_size=4, act8=True)
    assert "wq_scale_a8" in ok["llama"]["layers"]
    assert ok["llama"]["layers"]["wq_scale_a8"].shape == (2, 8, 2)


def test_parse_quant_mode_table():
    from valley_tpu.ops.quant import QUANT_MODES, parse_quant_mode

    assert parse_quant_mode("int8a8") == dict(bits=8, group_size=0,
                                              act8=True, packed=False)
    assert parse_quant_mode("int4gpa8") == dict(bits=4, group_size=128,
                                                act8=True, packed=True)
    # every table row is a valid quantizer-knobs combination
    for mode, qm in QUANT_MODES.items():
        if qm["packed"]:
            assert qm["bits"] == 4, mode
    with pytest.raises(ValueError, match="unknown quantization mode"):
        parse_quant_mode("int5")


def test_w4a8_group_proj_matches_manual_math():
    """The grouped W4A8 prefill path (act8 + group scales): per-token
    absmax int8 activation quant -> per-group int8 dot (int32 accumulate
    is exact) -> fp32 rescale by group weight scales, reduce, token
    scale."""
    from valley_tpu.models.llama import _A8_MIN_SEQ, _proj

    k, o, group, s = 96, 64, 32, _A8_MIN_SEQ
    g = k // group
    w = jax.random.normal(jax.random.key(11), (o, k)) * \
        (0.05 + 0.1 * jnp.arange(k) / k)
    q, scale = quantize_tensor(w, bits=4, group_size=group)
    assert scale.shape == (o, g)
    lp = {"p": q, "p_scale_a8": scale}
    x = jax.random.normal(jax.random.key(12), (1, s, k), jnp.float32)
    y = np.asarray(_proj(lp, "p", x)).reshape(s, o)

    xf = np.asarray(x, np.float32).reshape(s, k)
    amax = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-6)
    ascale = amax / 127.0
    xq = np.round(xf / ascale).astype(np.int32).reshape(s, g, group)
    wq = np.asarray(q, np.int32).reshape(o, g, group)
    part = np.einsum("tgi,ogi->tog", xq, wq).astype(np.float32)
    ref = (part * np.asarray(scale, np.float32)[None]).sum(-1) * ascale
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
    # quality: combined int4-group weight + per-token activation error
    # stays in the int4 class even on this adversarial magnitude ramp
    # (worst ELEMENT vs the global max — the mean-level gate lives in
    # tools/quant_report.py)
    full = xf @ np.asarray(w, np.float32).T
    rel = np.abs(y - full).max() / np.abs(full).max()
    assert rel < 0.2, rel


def test_w4a8_below_seq_threshold_bit_identical_to_int4g():
    """Decode / speculative-verify chunks (< _A8_MIN_SEQ wide) of an
    int4ga8 tree take the IDENTICAL grouped dequant paths an int4g tree
    does — bit-exact, so decode output is token-identical to int4g."""
    from valley_tpu.models.llama import _A8_MIN_SEQ, _proj

    k, o, group = 96, 64, 32
    w = jax.random.normal(jax.random.key(13), (o, k)) * 0.1
    q, scale = quantize_tensor(w, bits=4, group_size=group)
    x = jax.random.normal(jax.random.key(14), (1, _A8_MIN_SEQ - 1, k),
                          jnp.float32)
    y_a8 = _proj({"p": q, "p_scale_a8": scale}, "p", x)
    y_g = _proj({"p": q, "p_scale": scale}, "p", x)
    np.testing.assert_array_equal(np.asarray(y_a8), np.asarray(y_g))


def test_int4ga8_engine_below_gate_identical_above_gate_engages(
        cfg, params):
    """End-to-end _A8_MIN_SEQ contract for the GROUPED a8 modes through
    the real engine (the int4 analogue of the int8a8 test above):
    (1) below-gate generations of int4ga8 and int4gpa8 are bit-identical
    to int4g's; (2) a >= 128-wide forward engages the W4A8 dot (logits
    drift but stay close) and the engine still generates."""
    from valley_tpu.ops.quant import pack_int4_params

    gsize = cfg.text.hidden_size // 2
    q_g = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4,
                                group_size=gsize)
    q_a8 = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4,
                                 group_size=gsize, act8=True)
    q_pa8 = pack_int4_params(jax.tree.map(jnp.copy, q_a8))
    assert "wq_scale_a8" in q_a8["llama"]["layers"]
    prompt = list(range(10, 25))
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)

    def gen_tokens(p, bucket, **kw):
        eng = Engine(cfg, p, buckets=(bucket,), max_new_tokens=8,
                     cache_dtype=jnp.float32, use_flash=False, **kw)
        return [int(t[0]) for t in
                eng.generate_tokens([prompt], gen=gen, eos_ids=[-1])]

    expect = gen_tokens(q_g, 64, decode_w4=True)
    assert gen_tokens(q_a8, 64, decode_w4=True) == expect
    assert gen_tokens(q_pa8, 64, w4_packed=True) == expect

    # (2) >= 128-wide forward: the W4A8 path engages
    ids = jnp.asarray(
        np.random.default_rng(1).integers(5, 400, (1, 130)))
    lg_g = valley.forward(q_g, cfg, ids)
    lg_a8 = valley.forward(q_a8, cfg, ids)
    diff = float(jnp.abs(lg_g - lg_a8).max())
    assert diff > 0.0, "W4A8 path never engaged at seq 130"
    assert diff < 0.5 * float(jnp.abs(lg_g).max()), diff
    assert len(gen_tokens(q_a8, 256, decode_w4=True)) == 6
    assert len(gen_tokens(q_pa8, 256, w4_packed=True)) == 6


# -- nibble-packed int4 storage (ops/quant.pack_int4_params) -------------


def test_pack_unpack_nibbles_roundtrip():
    from valley_tpu.ops.quant import _pack_nibbles, _unpack_nibbles

    rng = np.random.default_rng(9)
    # stacked layer layout (L, out, in): pack along the contraction axis
    w = jnp.asarray(rng.integers(-7, 8, (3, 8, 16)), jnp.int8)
    p = _pack_nibbles(w, axis=-1)
    assert p.dtype == jnp.uint8 and p.shape == (3, 8, 8)
    back = _unpack_nibbles(p, axis=-1)
    assert back.dtype == jnp.int4
    np.testing.assert_array_equal(np.asarray(back.astype(jnp.int8)),
                                  np.asarray(w))
    # lm_head layout (in, out): pack along axis -2
    h = jnp.asarray(rng.integers(-7, 8, (16, 10)), jnp.int8)
    ph = _pack_nibbles(h, axis=-2)
    assert ph.shape == (8, 10)
    backh = _unpack_nibbles(ph, axis=-2)
    np.testing.assert_array_equal(np.asarray(backh.astype(jnp.int8)),
                                  np.asarray(h))


def test_pack_int4_rejects_int8_range_tree(cfg, params):
    from valley_tpu.ops.quant import pack_int4_params

    q8 = quantize_llama_params(jax.tree.map(jnp.copy, params))  # bits=8
    with pytest.raises(ValueError, match="quantize with bits=4"):
        pack_int4_params(q8)


def test_w4_packed_engine_matches_int4g(cfg, params):
    """int4gp (nibble-packed storage, unpack view in EVERY executable)
    is token-identical to int4g (int8 storage + decode-only int4 view):
    the unpacked values are bit-equal, so prefill/decode math agrees."""
    from valley_tpu.ops.quant import pack_int4_params

    gsize = cfg.text.hidden_size // 2
    q = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4,
                              group_size=gsize)
    qp = pack_int4_params(jax.tree.map(jnp.copy, q))
    lay = qp["llama"]["layers"]
    assert lay["wq"].dtype == jnp.uint8
    assert lay["wq"].shape[-1] == q["llama"]["layers"]["wq"].shape[-1] // 2

    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    prompt = list(range(10, 30))
    base = Engine(cfg, q, buckets=(64,), max_new_tokens=8,
                  cache_dtype=jnp.float32, use_flash=False, decode_w4=True)
    expect = [int(t[0]) for t in base.generate_tokens([prompt], gen=gen,
                                                      eos_ids=[-1])]
    packed = Engine(cfg, qp, buckets=(64,), max_new_tokens=8,
                    cache_dtype=jnp.float32, use_flash=False,
                    w4_packed=True)
    got = [int(t[0]) for t in packed.generate_tokens([prompt], gen=gen,
                                                     eos_ids=[-1])]
    assert got == expect

    # session extension + speculative compose over packed storage
    from valley_tpu.inference.engine import ChatSession
    from valley_tpu.inference.speculative import SpecConfig, SpecDecoder

    sess = ChatSession(packed, gen)
    r1 = sess.chat(prompt, eos_ids=[-1])
    assert r1 == expect
    dec = SpecDecoder(packed, SpecConfig(draft_len=4, rounds_per_call=2))
    spec = list(dec.generate_tokens(prompt, None, gen, eos_ids=[-1]))
    assert spec == expect


def test_w4_packed_engine_rejects_unpacked_tree(cfg, params):
    q = quantize_llama_params(jax.tree.map(jnp.copy, params), bits=4)
    with pytest.raises(ValueError, match="not nibble-packed"):
        Engine(cfg, q, buckets=(64,), max_new_tokens=8,
               cache_dtype=jnp.float32, use_flash=False, w4_packed=True)


# -- host-side (numpy) quantization: the quantize-on-load path -----------


def _host_tree(params):
    """Device tree -> bf16 HOST (numpy ml_dtypes) mirror of the llama
    branch, the form `hf_bridge.convert_llama(device=False)` produces."""
    dev = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                       params["llama"])
    return {"llama": jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)), dev)}


@pytest.mark.parametrize("bits,gsize,act8", [
    (8, 0, False), (8, 0, True), (4, 0, False), (4, 32, False),
    (4, 32, True)])
def test_host_quantizer_matches_device(cfg, params, bits, gsize, act8):
    """`quantize_llama_params_host` (numpy, the 13B quantize-on-load
    path) is bit-identical to the device quantizer: same int8 codes,
    same bf16 scales, every mode."""
    from valley_tpu.ops.quant import quantize_llama_params_host

    bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                        {"llama": params["llama"]})
    dev = quantize_llama_params(
        jax.tree.map(jnp.copy, bf16), bits=bits, group_size=gsize,
        act8=act8)
    host = quantize_llama_params_host(
        _host_tree(params), bits=bits, group_size=gsize, act8=act8)
    scale_key = "_scale_a8" if act8 else "_scale"
    lay_d, lay_h = dev["llama"]["layers"], host["llama"]["layers"]
    checked = 0
    for name in ("wq", "wo", "w_down"):
        np.testing.assert_array_equal(
            np.asarray(lay_d[name]), lay_h[name], err_msg=name)
        sd = np.asarray(lay_d[name + scale_key]).view(np.uint16)
        sh = lay_h[name + scale_key].view(np.uint16)  # bitwise bf16
        np.testing.assert_array_equal(sd, sh, err_msg=name + scale_key)
        checked += 1
    assert checked == 3
    np.testing.assert_array_equal(np.asarray(dev["llama"]["lm_head"]),
                                  host["llama"]["lm_head"])
    np.testing.assert_array_equal(
        np.asarray(dev["llama"]["lm_head_scale"]).view(np.uint16),
        host["llama"]["lm_head_scale"].view(np.uint16))


def test_host_pack_matches_device_pack(cfg, params):
    from valley_tpu.ops.quant import (pack_int4_params,
                                      pack_int4_params_host,
                                      quantize_llama_params_host)

    bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                        {"llama": params["llama"]})
    dev = pack_int4_params(quantize_llama_params(
        jax.tree.map(jnp.copy, bf16), bits=4, group_size=32))
    host = pack_int4_params_host(quantize_llama_params_host(
        _host_tree(params), bits=4, group_size=32))
    for name in ("wq", "w_down"):
        got = host["llama"]["layers"][name]
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(
            np.asarray(dev["llama"]["layers"][name]), got, err_msg=name)
    np.testing.assert_array_equal(np.asarray(dev["llama"]["lm_head"]),
                                  host["llama"]["lm_head"])


def test_host_pack_rejects_int8_range():
    from valley_tpu.ops.quant import pack_int4_params_host

    tree = {"llama": {"layers": {
        "wq": np.full((2, 4, 8), 100, np.int8)}, "lm_head": None}}
    with pytest.raises(ValueError, match="quantize with bits=4"):
        pack_int4_params_host(tree)
