"""Batch offline inference (inference/batch_infer.py): JSONL in/out
through the continuous-batching pool, crash-safe resume, media rows.

The reference has no batch path at all — its offline scripts are one
request per process (`valley/inference/run_valley.py`)."""

import json

import numpy as np
import pytest

from valley_tpu.inference.batch_infer import (build_parser, run_batch,
                                              _done_ids, _load_requests)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (40, 56, 3), dtype=np.uint8))
    img.save(d / "img.png")
    # a "video" as a directory of frames (data/video.py supports both)
    vdir = d / "clip"
    vdir.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)).save(
                vdir / f"{i:03d}.png")
    return d


def _args(tmp_path, extra=()):
    return build_parser().parse_args([
        "--model-path", "random:tiny",
        "--input", str(tmp_path / "in.jsonl"),
        "--output", str(tmp_path / "out.jsonl"),
        "--rows", "2", "--admit-batch", "1",
        "--buckets", "128", "--kv-cache", "bf16",
        "--max-new-tokens", "8", "--steps-per-call", "4",
        "--num-frames", "2", "--system-prompt", "sys",
        "--inflight", "4", *extra])


def test_batch_infer_end_to_end_and_resume(tmp_path, media_dir):
    reqs = [
        {"id": "t1", "query": "hello there"},
        {"id": "t2", "query": "short", "max_new_tokens": 4,
         "temperature": 1.0},
        {"id": "v1", "video": str(media_dir / "clip"),
         "query": "Describe the video."},
        {"id": "i1", "image": str(media_dir / "img.png"),
         "query": "What is shown?"},
    ]
    _write_jsonl(tmp_path / "in.jsonl", reqs)
    args = _args(tmp_path)

    summary = run_batch(args)
    assert summary["ran"] == 4 and summary["errors"] == 0

    out = {json.loads(l)["id"]: json.loads(l)
           for l in open(tmp_path / "out.jsonl")}
    assert set(out) == {"t1", "t2", "v1", "i1"}
    for rec in out.values():
        assert isinstance(rec["response"], str)
        assert rec["tokens"] >= 1
        assert rec["ttft_s"] is not None
    assert out["t2"]["tokens"] <= 4          # per-line max_new_tokens

    # resume: nothing to do on a second run
    summary2 = run_batch(args)
    assert summary2["ran"] == 0 and summary2["skipped"] == 4

    # a new row appended to the input runs alone
    _write_jsonl(tmp_path / "in.jsonl", reqs + [
        {"id": "t3", "query": "another"}])
    summary3 = run_batch(args)
    assert summary3["ran"] == 1 and summary3["skipped"] == 4
    assert sum(1 for _ in open(tmp_path / "out.jsonl")) == 5


def test_batch_infer_bad_rows_are_isolated(tmp_path):
    _write_jsonl(tmp_path / "in.jsonl", [
        {"id": "bad", "video": str(tmp_path / "missing.mp4"),
         "query": "x"},
        {"id": "ok", "query": "fine"},
    ])
    args = _args(tmp_path)
    summary = run_batch(args)
    assert summary["ran"] == 2 and summary["errors"] == 1
    out = {json.loads(l)["id"]: json.loads(l)
           for l in open(tmp_path / "out.jsonl")}
    assert "error" in out["bad"] and "response" in out["ok"]


def test_load_requests_validates(tmp_path):
    (tmp_path / "in.jsonl").write_text('{"noquery": 1}\n')
    with pytest.raises(ValueError, match="missing 'query'"):
        _load_requests(str(tmp_path / "in.jsonl"))
    (tmp_path / "out.jsonl").write_text(
        '{"id": "a"}\n{"broken json\n{"noid": 1}\n')
    assert _done_ids(str(tmp_path / "out.jsonl")) == {"a"}
