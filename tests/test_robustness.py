"""Edge cases and serialization robustness across the library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.conversation import Conversation, SeparatorStyle
from valley_tpu.data.dataset import DataCollatorForSupervisedDataset
from valley_tpu.data.preprocess import preprocess
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import valley
from valley_tpu.tokenizer import ByteFallbackTokenizer


def test_config_json_roundtrip():
    cfg = C.valley_7b(patch_pooling_method="temporal_transformer")
    text = cfg.to_json()
    back = C.ValleyConfig.from_json(text)
    assert back == cfg


def test_conversation_two_separator_style():
    conv = Conversation(system="SYS", roles=("A", "B"), messages=[],
                        offset=0, sep_style=SeparatorStyle.TWO,
                        sep="###", sep2="</s>")
    conv.append_message("A", "q1")
    conv.append_message("B", "a1")
    conv.append_message("A", "q2")
    conv.append_message("B", None)
    # seps alternate by message index (reference conversation.py:36-46)
    assert conv.get_prompt() == "SYS###A: q1###B: a1</s>A: q2###B:"
    copy = conv.copy()
    copy.append_message("B", "x")
    assert len(conv.messages) == 4  # deep copy of message list
    d = conv.dict()
    assert d["sep2"] == "</s>"


def test_conversation_tuple_messages_in_prompt():
    conv = Conversation(system="S", roles=("H", "A"), messages=[],
                        offset=0)
    conv.append_message("H", ("look at this", "fake_media", "Crop"))
    assert "look at this" in conv.get_prompt()
    assert "fake_media" not in conv.get_prompt()


def test_collator_truncates_to_max_length():
    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=8,
                                            max_length=16)
    inst = [{"input_ids": np.arange(1, 40), "labels": np.arange(1, 40)}]
    out = coll(inst)
    assert out["input_ids"].shape == (1, 16)
    assert out["attention_mask"].sum() == 16


def test_collator_text_only_batch_has_no_images():
    coll = DataCollatorForSupervisedDataset(pad_token_id=0)
    out = coll([{"input_ids": np.arange(5), "labels": np.arange(5)}])
    assert "images" not in out and "frame_mask" not in out


def test_preprocess_respects_model_max_length():
    tk = ByteFallbackTokenizer(model_max_length=24)
    sources = [[{"from": "human", "value": "x" * 200},
                {"from": "gpt", "value": "y" * 200}]]
    out = preprocess(sources, tk, "v1")
    assert len(out["input_ids"][0]) == 24


def test_engine_rejects_empty_prompt():
    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    with pytest.raises(ValueError):
        next(eng.generate_tokens([[]], gen=GenerationConfig(
            max_new_tokens=1)))


def test_engine_prompt_exactly_bucket_size():
    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(16,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    toks = [int(t[0]) for t in eng.generate_tokens(
        [list(range(10, 26))],       # exactly 16 tokens
        gen=GenerationConfig(max_new_tokens=3, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 3


def test_mask_targets_handles_short_sequences():
    from valley_tpu.data.preprocess import mask_targets

    target = np.arange(3)
    # header longer than the sequence — everything masked, no crash
    mask_targets(target, [5], [], only_mask_system=False)
    assert (target == -100).all()


def test_special_tokens_resolution_byte_tokenizer():
    tk = ByteFallbackTokenizer()
    toks = tk.special_tokens()
    ids = {toks.im_patch, toks.im_start, toks.im_end, toks.vi_frame,
           toks.vi_start, toks.vi_end}
    assert len(ids) == 6 and all(i >= 259 for i in ids)
    # encode/decode roundtrip with special tokens preserved
    text = "<im_start><im_patch><im_end> hi"
    enc = tk.encode(text, add_bos=False)
    assert enc[:3] == [toks.im_start, toks.im_patch, toks.im_end]
    assert tk.decode(enc) == " hi"
    assert tk.decode(enc, skip_special_tokens=False).startswith("<im_start>")


def test_dataloader_parallel_fetch_deterministic():
    from valley_tpu.data.dataset import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"input_ids": np.full(4, i), "labels": np.full(4, i)}

    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=4)
    serial = list(DataLoader(DS(), 4, coll, seed=1,
                             num_workers=1).epoch(0))
    parallel = list(DataLoader(DS(), 4, coll, seed=1,
                               num_workers=4).epoch(0))
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
