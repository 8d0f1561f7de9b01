"""Static-shape sequence packing (beyond-reference: the CUDA reference pads
every sequence to max_length and relies on flash-attn varlen to skip pads;
on TPU we instead pack several sequences into fixed-length rows with
segment ids — the XLA-friendly equivalent of cu_seqlens, and a real
throughput win because pad tokens vanish from every matmul, not just
attention.

Geometry is static for jit: a batch of B sequences packs into exactly
R = ceil(B / max_segments) rows of row_len tokens, each row holding at most
max_segments segments. First-fit-decreasing keeps rows balanced; a sequence
that cannot fully fit in its row's remaining space is truncated (choose
max_segments ~ row_len / mean_len so this stays rare — the tokenizer
truncates to a max length anyway).

Output contract (consumed by BiEncoder's packed path):
  input_ids    [R, row_len]  packed tokens, pad_id elsewhere
  segment_ids  [R, row_len]  1..max_segments per segment, 0 = pad
  position_ids [R, row_len]  restart at 0 at each segment start
  pair_index   [B]           flat gather index row * max_segments + (seg - 1)
                             recovering sequence i's pooled embedding from
                             the [R * max_segments, D] per-segment matrix
  last_token_index [B]       flat gather index row * row_len + last-token
                             position (per-segment last-token pooling for
                             causal/decoder trunks)
"""

from typing import Dict, List

import numpy as np


def pack_tokenized(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    row_len: int,
    max_segments: int,
    pad_id: int = 0,
) -> Dict[str, np.ndarray]:
    """Pack padded [B, L] tokenized sequences into [R, row_len] rows."""
    B = input_ids.shape[0]
    lengths = attention_mask.sum(axis=1).astype(np.int64)
    R = -(-B // max_segments)

    ids = np.full((R, row_len), pad_id, dtype=input_ids.dtype)
    seg = np.zeros((R, row_len), dtype=np.int32)
    pos = np.zeros((R, row_len), dtype=np.int32)
    pair_index = np.zeros(B, dtype=np.int32)
    last_token_index = np.zeros(B, dtype=np.int32)
    used = np.zeros(R, dtype=np.int64)
    nseg = np.zeros(R, dtype=np.int64)
    zero_seqs: List[int] = []

    order = np.argsort(-lengths, kind="stable")  # longest first
    for i in order:
        n = int(min(lengths[i], row_len))
        # first row with space for the whole sequence and a free slot;
        # fallback: the free-slot row with the most space (truncate)
        candidates = np.flatnonzero((nseg < max_segments) & (used + n <= row_len))
        if candidates.size:
            r = int(candidates[0])
        else:
            free = np.flatnonzero(nseg < max_segments)
            r = int(free[np.argmax(row_len - used[free])])
            n = int(row_len - used[r])
            if n == 0:
                # the slot exists but holds no tokens; its pooled embedding
                # is exactly zero (normalize is VJP-safe at zero). Size
                # row_len/max_segments to the data to avoid this.
                print(
                    f"[packing] sequence {i} truncated to 0 tokens "
                    f"(row_len={row_len}, max_segments={max_segments} too tight)",
                    flush=True,
                )
        start = int(used[r])
        if n > 0:
            ids[r, start : start + n] = input_ids[i, :n]
            seg[r, start : start + n] = nseg[r] + 1
            pos[r, start : start + n] = np.arange(n, dtype=np.int32)
            last_token_index[i] = r * row_len + start + n - 1
        else:
            # 0-token truncation only happens when the chosen row is FULL:
            # start == row_len, so clamping inside this row would alias
            # another sequence's last token and 'last' pooling would return
            # an exact copy of that sample's embedding. Point at a genuine
            # pad slot instead (resolved after packing, when free space is
            # final) — the gathered embedding is then the pad hidden state.
            zero_seqs.append(i)
        pair_index[i] = r * max_segments + int(nseg[r])
        used[r] += n
        nseg[r] += 1

    for i in zero_seqs:
        free_rows = np.flatnonzero(used < row_len)
        if free_rows.size:
            r0 = int(free_rows[0])
            last_token_index[i] = r0 * row_len + int(used[r0])  # a pad slot
        else:
            # every row full: no pad slot exists anywhere; point inside the
            # sequence's own row — BiEncoder's packed 'last' path zeroes
            # embeddings of zero-token segments, so the aliased gather is
            # masked out downstream
            last_token_index[i] = (pair_index[i] // max_segments) * row_len + row_len - 1

    return {
        "input_ids": ids,
        "segment_ids": seg,
        "position_ids": pos,
        "pair_index": pair_index,
        "last_token_index": last_token_index,
    }


def packing_efficiency(attention_mask: np.ndarray, row_len: int, max_segments: int) -> float:
    """Padded-token budget over packed-token budget (>1 = packing shrinks
    the matmul work). NOTE this is geometry-only — (B*L)/(R*row_len); the
    mask content cancels. The content-dependent question (does the packed
    geometry TRUNCATE tokens?) is measured by packing_kept_fraction."""
    B, L = attention_mask.shape
    R = -(-B // max_segments)
    return (B * L) / (R * row_len)


def packing_kept_fraction(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    row_len: int,
    max_segments: int,
    pad_id: int = 0,
) -> float:
    """Fraction of real tokens that survive a dry pack at this geometry
    (<1 means pack_tokenized would truncate sequences to fit rows)."""
    real = float(attention_mask.sum())
    if real == 0:
        return 1.0
    packed = pack_tokenized(
        input_ids, attention_mask, row_len=row_len, max_segments=max_segments, pad_id=pad_id
    )
    return float((packed["segment_ids"] > 0).sum()) / real
