"""Multi-host training data path (VERDICT r2 item 2).

The reference trains multi-process via torchrun: 8 ranks, each running
its own DataLoader over its sampler shard (`valley/train/train.sh:1`).
The JAX equivalent built here: every process derives the same shuffled
order, loads only its contiguous rows of each global batch
(`DataLoader(process_index=, process_count=)`), and
`parallel.shard_batch` assembles the logical global array with
`jax.make_array_from_process_local_data` — verified below both
in-process (rank slices reassemble the exact global batch) and with a
REAL 2-process jax.distributed CPU cluster (tests/mp_worker.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.mp_worker import checksums, make_loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_process_batch():
    return next(iter(make_loader(0, 1).epoch(0)))


@pytest.mark.parametrize("world", [2, 4])
def test_rank_slices_reassemble_global_batch(world):
    """Concatenating the rank loaders' batches reproduces the
    single-process global batch exactly — order included (the fixed
    collator shapes make per-rank arrays concatenable)."""
    ref = _single_process_batch()
    parts = [next(iter(make_loader(r, world).epoch(0)))
             for r in range(world)]
    for k in ref:
        got = np.concatenate([p[k] for p in parts], axis=0)
        np.testing.assert_array_equal(got, ref[k], err_msg=k)


def test_rank_loader_rejects_bad_config():
    from valley_tpu.data.dataset import (DataCollatorForSupervisedDataset,
                                         DataLoader)

    coll = DataCollatorForSupervisedDataset()
    with pytest.raises(ValueError, match="divide"):
        DataLoader([], 10, coll, process_index=0, process_count=4)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader([], 8, coll, drop_last=False, process_index=0,
                   process_count=4)


def test_collator_fixed_shapes():
    """pad_to_length / pad_frames_to force identical shapes regardless of
    which samples land in the local slice."""
    from valley_tpu.data.dataset import DataCollatorForSupervisedDataset

    coll = DataCollatorForSupervisedDataset(pad_to_length=32,
                                            pad_frames_to=8)
    short = [{"input_ids": np.arange(3), "labels": np.arange(3),
              "image": np.zeros((2, 3, 4, 4), np.float32)}]
    longer = [{"input_ids": np.arange(17), "labels": np.arange(17),
               "image": np.zeros((5, 3, 4, 4), np.float32)}]
    a, b = coll(short), coll(longer)
    assert a["input_ids"].shape == b["input_ids"].shape == (1, 32)
    assert a["images"].shape == b["images"].shape == (1, 8, 3, 4, 4)
    assert a["frame_mask"].sum() == 2 and b["frame_mask"].sum() == 5


def test_two_process_cluster_assembles_identical_global_batch(tmp_path):
    """REAL 2-process jax.distributed CPU cluster: each process runs the
    per-rank DataLoader + shard_batch; the assembled global batch's
    order-sensitive checksums must equal the single-process loader's."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=REPO)
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    expected = checksums({k: np.asarray(v, np.float32)
                          for k, v in _single_process_batch().items()})
    for i in range(2):
        with open(tmp_path / f"proc{i}.json") as f:
            got = json.load(f)
        assert set(got) == set(expected)
        for k in expected:
            assert got[k] == pytest.approx(expected[k], rel=1e-5), k
