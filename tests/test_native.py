"""C++ data-plane: parity with the Python gzip path + throughput sanity."""

import gzip
import json
import time

import numpy as np
import pytest

from contrastors_tpu.data.indexing import index_shard


def make_shard(tmp_path, rows=2000, name="s.jsonl.gz"):
    path = tmp_path / name
    rng = np.random.default_rng(0)
    with gzip.open(path, "wt") as f:
        for i in range(rows):
            f.write(json.dumps({"i": i, "text": "x" * int(rng.integers(10, 200))}) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def native():
    import contrastors_tpu.native as n

    if n.get_lib() is None:
        pytest.skip("g++/zlib unavailable")
    return n


def test_native_index_matches_python(tmp_path, native):
    path = make_shard(tmp_path)
    py = index_shard(path)
    nat = native.index_file(path)
    assert nat == py


def test_native_index_many(tmp_path, native):
    paths = [make_shard(tmp_path, rows=100 + i, name=f"s{i}.jsonl.gz") for i in range(5)]
    results = native.index_many(paths, n_threads=4)
    for p, r in zip(paths, results):
        assert r == index_shard(p)


def test_native_stream_reads(tmp_path, native):
    path = make_shard(tmp_path, rows=500)
    offsets = index_shard(path)
    with gzip.open(path, "rb") as f:
        blob = f.read()

    s = native.NativeGzipStream(path)
    # sequential rank-batch style reads
    for start_row in (0, 100, 250):
        lo = offsets[str(start_row)][0]
        hi = offsets[str(start_row + 9)][1]
        s.seek(lo)
        data = s.read(hi - lo)
        assert data == blob[lo:hi]
    # rewind (reopen) works
    s.seek(0)
    assert s.read(10) == blob[:10]
    s.close()


def test_streaming_dataset_uses_native(tmp_path, native):
    from test_data import make_bucket, make_tokenizer
    from contrastors_tpu.data import StreamingShardDataset

    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)
    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=tok, seed=0,
        process_index=0, process_count=1, state_dir=str(tmp_path / "state"),
    )
    from contrastors_tpu.native import NativeGzipStream

    it = iter(ds)
    batches = [next(it)]
    # exhausted shards close their streams, so check while mid-shard
    assert any(isinstance(s, NativeGzipStream) for s in ds._streams.values())
    batches += list(it)
    assert len(batches) == 8
    # ... and every stream is closed once the corpus is fully consumed
    assert not ds._streams


def test_native_corrupt_gzip_surfaces_error(tmp_path):
    """A gzip shard corrupted mid-file must FAIL indexing (return -1 ->
    Python fallback raises), not silently return a partial index that
    undercounts counts.json."""
    import gzip as _gzip

    from contrastors_tpu.native import get_lib, index_many

    if get_lib() is None:
        pytest.skip("native dataplane unavailable")
    good = tmp_path / "good.jsonl.gz"
    with _gzip.open(good, "wt") as f:
        for i in range(200):
            f.write(f'{{"i": {i}, "pad": "{"x" * 100}"}}\n')
    blob = bytearray(good.read_bytes())
    # corrupt the deflate stream well past the header
    for off in range(len(blob) // 2, len(blob) // 2 + 16):
        blob[off] ^= 0xFF
    bad = tmp_path / "bad.jsonl.gz"
    bad.write_bytes(bytes(blob))

    res = index_many([str(good), str(bad)])
    assert res[0] is not None and len(res[0]) == 200
    assert res[1] is None, "corrupt shard must surface as an error, not a partial index"
