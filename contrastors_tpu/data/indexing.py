"""Shard bookkeeping: build counts.json + offsets.json.gz for a bucket of
gzip JSONL shards (reference: scripts/text/offsets_count.py semantics).

offsets map each row index to its (start, end) byte range in the
DECOMPRESSED stream, enabling mid-shard seeks for rank-aligned reads.
"""

import gzip
import json
import os
import re
from typing import Dict, List


def norm_shard_key(url: str) -> str:
    """Canonical shard key: trailing 3-4 path segments, scheme stripped.
    Shared by the index builder and StreamingShardDataset._norm so the
    counts/offsets lookups always agree (any scheme — s3://, file:// —
    and leading slashes are removed BEFORE segment counting)."""
    url = re.sub(r"^[a-z0-9]+://", "", url)
    parts = [p for p in url.split("/") if p]
    return "/".join(parts[-4:]) if len(parts) >= 6 else "/".join(parts[-3:])


def resolve_shard_key(url: str, keys) -> str:
    """Find the index key for `url` tolerant of mount-depth differences:
    norm_shard_key's segment count depends on the ABSOLUTE path depth, so
    an index built at /a/b/c/shard.gz keys differently from the same bucket
    read at /mnt/x/a/b/c/shard.gz. Try every trailing-suffix depth of the
    url, then unique-basename match against deeper stored keys. Raises
    KeyError (with guidance) when nothing — or more than one thing —
    matches."""
    path = re.sub(r"^[a-z0-9]+://", "", url)
    parts = [p for p in path.split("/") if p]
    for depth in range(min(len(parts), 6), 0, -1):
        suffix = "/".join(parts[-depth:])
        if suffix in keys:
            return suffix
    base = parts[-1]
    base_matches = [k for k in keys if k.split("/")[-1] == base]
    if len(base_matches) == 1:
        return base_matches[0]
    detail = f"{len(base_matches)} keys share basename {base!r}" if base_matches else "no key matches"
    raise KeyError(
        f"shard {url} not found in the bucket index ({detail}) — re-run "
        "scripts/build_index.py on this bucket"
    )


def index_shard(path: str) -> Dict[str, List[int]]:
    offsets = {}
    pos = 0
    with gzip.open(path, "rb") as f:
        for i, line in enumerate(f):
            offsets[str(i)] = [pos, pos + len(line)]
            pos += len(line)
    return offsets


def build_bucket_index(bucket_dir: str, pattern_suffix: str = ".jsonl.gz"):
    """Writes counts.json and offsets.json.gz next to the shards.

    Keys are normalized the way the streaming loader expects (last 3-4 path
    segments; see StreamingShardDataset._norm). Uses the C++ data-plane
    (native/dataplane.cpp) for thread-parallel inflate+index when available.
    """
    shards = sorted(
        f for f in os.listdir(bucket_dir) if f.endswith(pattern_suffix)
    )
    fulls = [os.path.join(bucket_dir, s) for s in shards]
    native_offsets = None
    try:
        from contrastors_tpu.native import index_many

        native_offsets = index_many(fulls)
    except Exception:
        native_offsets = None

    counts = {}
    offsets = {}
    for i, shard in enumerate(shards):
        full = fulls[i]
        off = None
        if native_offsets is not None:
            off = native_offsets[i]
        if off is None:
            off = index_shard(full)
        key = norm_shard_key(full)
        counts[key] = len(off)
        offsets[key] = off
    with open(os.path.join(bucket_dir, "counts.json"), "w") as f:
        json.dump(counts, f)
    with gzip.open(os.path.join(bucket_dir, "offsets.json.gz"), "wt") as f:
        json.dump(offsets, f)
    return counts
