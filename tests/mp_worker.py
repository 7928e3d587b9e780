"""One process of a 2-process CPU JAX cluster (tests/test_multihost.py).

Run: python mp_worker.py <proc_id> <nproc> <port> <outdir>
Env (set by the launching test, BEFORE the interpreter starts):
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4.

Exercises the REAL multi-host training data path — per-rank
`data.DataLoader` slice -> collator (fixed shapes) ->
`parallel.shard_batch` (make_array_from_process_local_data) — and writes
order-sensitive checksums of the assembled GLOBAL batch, which the test
compares against a single-process loader over the same dataset.  The
reference gets the per-rank loading from torchrun
(`valley/train/train.sh:1`); this is the jax.distributed equivalent.
"""

import json
import sys


def synthetic_dataset():
    """64 deterministic samples with ragged lengths + ragged frame
    counts (every 3rd has media) — the shapes multi-host collation must
    normalize."""
    import numpy as np

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            ids = np.arange(3 + (i % 7), dtype=np.int32) + i
            out = {"input_ids": ids, "labels": ids + 1}
            if i % 3 == 0:
                t = 1 + (i % 4)
                out["image"] = np.full((t, 3, 4, 4), float(i), np.float32)
            return out

    return DS()


def make_loader(process_index: int, process_count: int):
    from valley_tpu.data.dataset import (DataCollatorForSupervisedDataset,
                                         DataLoader)

    coll = DataCollatorForSupervisedDataset(
        pad_token_id=0, pad_to_length=16, pad_frames_to=4, max_length=16)
    return DataLoader(synthetic_dataset(), 16, coll, shuffle=True, seed=7,
                      num_workers=0, process_index=process_index,
                      process_count=process_count)


def checksums(batch_np):
    """Order-sensitive scalar per key: catches any row misplacement in
    the local->global assembly, not just missing rows."""
    import numpy as np

    out = {}
    for k, v in sorted(batch_np.items()):
        a = np.asarray(v, np.float64)
        w = 1.0 + np.arange(a.shape[0], dtype=np.float64)
        out[k] = float((a.reshape(a.shape[0], -1)
                        * w[:, None]).sum())
    return out


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    import jax

    jax.distributed.initialize(f"localhost:{port}", nproc, proc_id)
    import numpy as np
    from jax.sharding import Mesh

    from valley_tpu.parallel.mesh import AXES
    from valley_tpu.parallel.sharding import (process_batch_slice,
                                              shard_batch)

    devs = np.asarray(jax.devices()).reshape(nproc, 2, 2)
    mesh = Mesh(devs, AXES)   # data=nproc (one per host), fsdp=2, model=2

    # the mesh's row interval for this process must equal the loader's
    # contiguous rank slice
    sl = process_batch_slice(mesh, 16)
    per = 16 // nproc
    assert (sl.start, sl.stop) == (proc_id * per, (proc_id + 1) * per), sl

    loader = make_loader(proc_id, nproc)
    local = next(iter(loader.epoch(0)))
    assert local["input_ids"].shape == (per, 16), local["input_ids"].shape

    global_batch = shard_batch(mesh, local)
    # pull each key back via a jitted identity with replicated output so
    # every process can checksum the ASSEMBLED global array
    import jax.numpy as jnp
    from valley_tpu.parallel.sharding import replicated

    rep = replicated(mesh)
    gathered = {
        k: np.asarray(jax.jit(lambda a: a.astype(jnp.float32),
                              out_shardings=rep)(v))
        for k, v in global_batch.items()}
    for k, v in gathered.items():
        assert v.shape[0] == 16, (k, v.shape)
    with open(f"{outdir}/proc{proc_id}.json", "w") as f:
        json.dump(checksums(gathered), f)


if __name__ == "__main__":
    main()
