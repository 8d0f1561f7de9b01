"""Multi-process story: jax.distributed init gate, rank-disjoint sampling,
and a REAL two-process CPU run assembling a global batch from process-local
shards (reference counterpart: train.py:114-118 NCCL init + DDP)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_distributed_init_env_gate(monkeypatch):
    import jax
    from contrastors_tpu.utils.dist import maybe_initialize_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))

    monkeypatch.delenv("CONTRASTORS_TPU_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False and not calls

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    assert maybe_initialize_distributed() is True
    assert calls == [
        {"coordinator_address": "10.0.0.1:1234", "num_processes": 4, "process_id": 2}
    ]


def test_resampled_image_text_rank_disjoint(tmp_path):
    """Resampled shard draws must differ per rank (round-1 Weak #6)."""
    from test_data import make_tokenizer
    from test_image_text import make_tar_shards
    from contrastors_tpu.data.image_text import ImageTextDataset

    tok = make_tokenizer(tmp_path)
    pattern = make_tar_shards(tmp_path, n_shards=4, per_shard=4)

    def order(rank):
        ds = ImageTextDataset(
            pattern, global_batch_size=4, tokenizer=tok, image_size=32, seq_len=8,
            resampled=True, process_index=rank, process_count=2, seed=7,
        )
        return ds._shard_order()

    assert order(0) != order(1), "ranks drew identical resampled shard sequences"
    # but each rank is deterministic given (seed, epoch, rank)
    assert order(0) == order(0)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:{port}", num_processes=2, process_id={pid}
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from contrastors_tpu.parallel.mesh import shard_batch
    from contrastors_tpu.utils.dist import process_allmean

    assert jax.process_count() == 2
    devs = np.array(jax.devices()).reshape(-1, 1, 1)
    mesh = Mesh(devs, ("data", "expert", "tensor"))

    # each process holds its own half of the global batch
    local = {{"x": np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * {pid}}}
    batch = shard_batch(local, mesh)
    assert batch["x"].shape == (8, 2), batch["x"].shape

    @jax.jit
    def global_mean(b):
        return jnp.mean(b["x"])

    with mesh:
        m = float(global_mean(batch))
    # mean of [0..7] and [100..107] halves = (3.5 + 103.5) / 2
    assert abs(m - 53.5) < 1e-6, m

    red = process_allmean({{"metric": float(10 * ({pid} + 1))}})
    assert abs(red["metric"] - 15.0) < 1e-6, red
    print(f"proc {pid}: global_mean={{m}} allmean={{red['metric']}} ok")
    """
)


def test_two_process_cpu_training_batch():
    """Spawn two real CPU processes, assemble a global array from local
    shards via shard_batch, compute a global metric, and reduce a host-side
    metric across processes. One retry on a fresh port (the coordinator
    port can race under parallel suite load)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    last = None
    for _attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", CHILD.format(repo=REPO, port=port, pid=pid)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(2)
        ]
        try:
            outs = [p.communicate(timeout=240)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            last = "timeout waiting for child processes"
            continue
        if all(p.returncode == 0 and "ok" in out for p, out in zip(procs, outs)):
            return
        last = "\n---\n".join(outs)
    raise AssertionError(f"two-process run failed:\n{last}")


STREAM_CHILD = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:{port}", num_processes=2, process_id={pid}
    )
    import numpy as np
    from jax.sharding import Mesh
    from transformers import BertTokenizerFast
    from contrastors_tpu.data import StreamingShardDataset
    from contrastors_tpu.parallel.mesh import shard_batch

    pid = jax.process_index()
    assert pid == {pid} and jax.process_count() == 2
    tok = BertTokenizerFast(vocab_file={vocab!r}, do_lower_case=True)
    ds = StreamingShardDataset(
        {spec!r}, global_batch_size=8, tokenizer=tok, seed=123,
        process_index=pid, process_count=jax.process_count(),
        state_dir={state!r} + str(pid),
    )
    devs = np.array(jax.devices()).reshape(-1, 1, 1)
    mesh = Mesh(devs, ("data", "expert", "tensor"))
    rows, names, shapes = [], [], []
    for b in ds:
        rows.extend(np.asarray(b["query_input_ids"]).tolist())
        names.append(b["dataset_name"])
        gb = shard_batch({{"q": b["query_input_ids"]}}, mesh)
        shapes.append(list(gb["q"].shape))
    with open({out!r} + str(pid) + ".json", "w") as f:
        json.dump({{"rows": rows, "names": names, "shapes": shapes}}, f)
    print("stream child", pid, "ok")
    """
)


def test_two_process_streaming_windows(tmp_path):
    """REAL two-process run of StreamingShardDataset (ROADMAP #8): each
    process streams its own rank window under jax.distributed, assembles
    the global batch over the shared mesh, and together the two windows
    tile the corpus exactly (disjoint, complete, same shard order)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import make_bucket, make_tokenizer

    make_tokenizer(tmp_path)  # writes vocab.txt
    spec = make_bucket(tmp_path)
    vocab = str(tmp_path / "vocab.txt")
    out = str(tmp_path / "rows_rank")

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    last = None
    for _attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    STREAM_CHILD.format(
                        repo=REPO, port=port, pid=pid, vocab=vocab, spec=spec,
                        state=str(tmp_path / "state"), out=out,
                    ),
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(2)
        ]
        try:
            outs = [p.communicate(timeout=240)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            last = "timeout waiting for child processes"
            continue
        if all(p.returncode == 0 and "ok" in o for p, o in zip(procs, outs)):
            break
        last = "\n---\n".join(outs)
    else:
        raise AssertionError(f"two-process streaming run failed:\n{last}")

    import json as json_mod

    with open(out + "0.json") as f:
        r0 = json_mod.load(f)
    with open(out + "1.json") as f:
        r1 = json_mod.load(f)
    # same shard order and batch count on both ranks; global batches are
    # full-size even though each rank holds half
    assert r0["names"] == r1["names"] and len(r0["names"]) == 8
    assert all(s == [8, 32] for s in r0["shapes"] + r1["shapes"])
    rows0 = {tuple(r) for r in r0["rows"]}
    rows1 = {tuple(r) for r in r1["rows"]}
    assert len(rows0) == 32 and len(rows1) == 32
    assert not rows0 & rows1, "rank windows overlap"


def test_packed_pair_index_rank_offset(tmp_path, monkeypatch):
    """Under multi-host, packed pair_index must address this rank's slice of
    the globally assembled slot matrix (code-review finding: without the
    offset every rank gathered rank 0's embeddings)."""
    import jax
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_trainer_e2e import base_config, make_checkpoint_dir, make_pairs_file
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    ckpt = make_checkpoint_dir(tmp_path)
    data = make_pairs_file(tmp_path, n=32)
    cfg = base_config(ckpt, data, str(tmp_path / "run"), num_epochs=1)
    cfg.data_args.batch_size = 16
    cfg.data_args.packed = True
    cfg.data_args.packed_seq_len = 32
    cfg.data_args.packed_max_segments = 2  # -> 8 local rows, 16 slots
    trainer = TRAINER_REGISTRY["encoder"](cfg, "fp32")
    batch = next(iter(trainer.dataloader))

    out0 = trainer.transform_host_batch(dict(batch))
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    out1 = trainer.transform_host_batch(dict(batch))
    rows, K = out0["query_input_ids"].shape[0], 2
    np.testing.assert_array_equal(
        out1["query_pair_index"], out0["query_pair_index"] + rows * K
    )
