"""Rotary position embeddings as pure functions.

The reference wraps flash-attn's in-place CUDA rotary kernels in four module
variants (reference: layers/embedding.py:618-866 — VarLengthRotaryEmbedding,
DynamicNTKRotaryEmbedding, LlamaRopeEmbedding, RotaryEmbeddingCat). On TPU a
rotary is two elementwise multiplies that XLA fuses into the surrounding
attention matmuls, so we express everything as stateless cos/sin builders +
apply functions; caching is unnecessary because jit constant-folds the
tables for static sequence lengths.
"""

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def rotary_inv_freq(dim: int, base: float) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))


def ntk_scaled_base(base: float, dim: int, seqlen: int, max_trained: int, scaling_factor: float) -> float:
    """DynamicNTK base extension past the trained context
    (reference: layers/embedding.py:809-818)."""
    if seqlen <= max_trained:
        return base
    return base * ((scaling_factor * seqlen / max_trained) - (scaling_factor - 1)) ** (
        dim / (dim - 2)
    )


def llama3_inv_freq(dim: int, base: float, rope_scaling: dict) -> np.ndarray:
    """Llama-3 frequency-band smoothing (reference: layers/embedding.py:771-796)."""
    inv_freq = rotary_inv_freq(dim, base)
    factor = rope_scaling["factor"]
    low = rope_scaling["low_freq_factor"]
    high = rope_scaling["high_freq_factor"]
    old_ctx = rope_scaling["original_max_position_embeddings"]

    wavelen = 2 * math.pi / inv_freq
    scaled = np.where(wavelen > old_ctx / low, inv_freq / factor, inv_freq)
    smooth = (old_ctx / wavelen - low) / (high - low)
    smoothed = (1 - smooth) * scaled / factor + smooth * scaled
    is_medium = ~(wavelen < old_ctx / high) & ~(wavelen > old_ctx / low)
    return np.where(is_medium, smoothed, scaled).astype(np.float32)


def rotary_cos_sin(
    seqlen: int,
    rotary_dim: int,
    base: float = 10_000.0,
    rope_scaling: Optional[dict] = None,
    rotary_scaling_factor: Optional[float] = None,
    max_trained_positions: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape [seqlen, rotary_dim // 2], fp32.

    Variant selection mirrors the reference's module dispatch
    (layers/attention.py:50-77): rope_scaling => llama3 bands,
    rotary_scaling_factor => DynamicNTK, else plain RoPE.
    """
    if rope_scaling is not None:
        inv_freq = llama3_inv_freq(rotary_dim, base, rope_scaling)
    else:
        if rotary_scaling_factor is not None:
            base = ntk_scaled_base(base, rotary_dim, seqlen, max_trained_positions, rotary_scaling_factor)
        inv_freq = rotary_inv_freq(rotary_dim, base)
    t = np.arange(seqlen, dtype=np.float32)
    freqs = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(freqs)), jnp.asarray(np.sin(freqs))


def _rot_matrix(dim: int, rot_dim: int, interleaved: bool) -> np.ndarray:
    """Constant [dim, dim] matrix R with x @ R == the rotate-half permutation
    on the first rot_dim features (zero rows for pass-through dims — their
    sin table entries are 0 so the contribution vanishes). Entries are ±1
    one-hots: the bf16 MXU matmul is an exact signed copy."""
    R = np.zeros((dim, dim), np.float32)
    if interleaved:
        idx = np.arange(0, rot_dim, 2)
        R[idx + 1, idx] = -1.0  # (x0, x1) -> (-x1, x0)
        R[idx, idx + 1] = 1.0
    else:
        half = rot_dim // 2
        i = np.arange(half)
        R[i + half, i] = -1.0  # (x1, x2) -> (-x2, x1)
        R[i, i + half] = 1.0
    return R


def _expand_tables(cos, sin, seqlen, dim, interleaved):
    """[S, rot/2] tables -> [S, dim] fp32, laid out per the convention
    (repeat-interleave for GPT-J pairs, duplicate-halves for NeoX), padded
    with identity rows (cos=1, sin=0) over any pass-through tail."""
    cos = cos[:seqlen].astype(jnp.float32)
    sin = sin[:seqlen].astype(jnp.float32)
    if interleaved:
        cos_d = jnp.repeat(cos, 2, axis=-1)
        sin_d = jnp.repeat(sin, 2, axis=-1)
    else:
        cos_d = jnp.concatenate([cos, cos], axis=-1)
        sin_d = jnp.concatenate([sin, sin], axis=-1)
    pad = dim - cos_d.shape[-1]
    if pad:
        cos_d = jnp.pad(cos_d, ((0, 0), (0, pad)), constant_values=1.0)
        sin_d = jnp.pad(sin_d, ((0, 0), (0, pad)), constant_values=0.0)
    return cos_d, sin_d


def _apply_rotary_mxu(x, cos, sin, interleaved):
    """MXU formulation of apply_rotary (the ViT-rope trick generalized —
    see apply_rope_cat_prefixed): the rotate-half permutation rides the MXU
    as a matmul against a constant signed one-hot matrix, and the
    elementwise combine runs on the flattened [B, S, H*d] layout with
    head-tiled tables (head_dim 64 is half a TPU lane width — the 4-D
    broadcast wastes every other lane). Bit-exact vs the sliced form:
    the matmul is a signed copy and IEEE a*c - b*s == a*c + (-b)*s."""
    B, S, H, Dh = x.shape
    rot_dim = cos.shape[-1] * 2
    cos_d, sin_d = _expand_tables(cos, sin, S, Dh, interleaved)
    cos_w = jnp.tile(cos_d, (1, H))  # [S, H*d]
    sin_w = jnp.tile(sin_d, (1, H))
    R = jnp.asarray(_rot_matrix(Dh, rot_dim, interleaved), x.dtype)
    rot = (x @ R).reshape(B, S, H * Dh)
    xf = x.reshape(B, S, H * Dh)
    out = xf.astype(jnp.float32) * cos_w + rot.astype(jnp.float32) * sin_w
    return out.astype(x.dtype).reshape(B, S, H, Dh)


def apply_rotary(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    interleaved: bool = False,
    position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rotate the first 2*cos.shape[-1] features of each head.

    x: [batch, seq, heads, head_dim]; cos/sin: [max_seq, rot_dim/2] fp32.
    position_ids: optional [batch, seq] gather indices into the tables
    (used for packed sequences where positions restart at segment starts).
    """
    if position_ids is None:
        # static positions: the MXU fast path (identical numerics)
        return _apply_rotary_mxu(x, cos, sin, interleaved)
    # gathered positions (packed sequences): same signed-permutation matmul
    # for the rotate-half; the per-(batch, seq) tables are expanded to the
    # full head_dim once and gathered as [B, S, d] rows (identity rows over
    # any pass-through tail keep x_pass exact), then broadcast over heads.
    Dh = x.shape[-1]
    rot_dim = cos.shape[-1] * 2
    cos_d, sin_d = _expand_tables(cos, sin, cos.shape[0], Dh, interleaved)
    cos_b = cos_d[position_ids][:, :, None, :]  # [B, S, 1, d]
    sin_b = sin_d[position_ids][:, :, None, :]
    R = jnp.asarray(_rot_matrix(Dh, rot_dim, interleaved), x.dtype)
    out = x.astype(jnp.float32) * cos_b + (x @ R).astype(jnp.float32) * sin_b
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# 2-D rotary for ViT (EVA02-style "cat" rope).
# Reference: layers/embedding.py:118-354 (build_fourier_pos_embed,
# build_rotary_pos_embed, RotaryEmbeddingCat with in_pixels=False).
# ---------------------------------------------------------------------------


def build_2d_rope_cat(
    dim: int,
    feat_shape: Tuple[int, int],
    temperature: float = 10_000.0,
    ref_feat_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Returns [H*W, 2*dim] fp32: sin||cos, each repeat_interleave(2)d.

    dim is the per-head dimension; num_bands = dim // 4 per spatial axis.
    """
    num_bands = dim // 4
    exp = np.arange(0, num_bands, 1, dtype=np.float32) / num_bands
    bands = 1.0 / (temperature**exp)  # [nb]

    t = [np.arange(s, dtype=np.float32) for s in feat_shape]
    if ref_feat_shape is not None:
        t = [x / f * r for x, f, r in zip(t, feat_shape, ref_feat_shape)]
    grid = np.stack(np.meshgrid(*t, indexing="ij"), axis=-1)  # [H, W, 2]
    pos = grid[..., None] * bands  # [H, W, 2, nb]

    n = feat_shape[0] * feat_shape[1]
    sin = np.repeat(np.sin(pos).reshape(n, -1), 2, axis=-1)  # [N, dim]
    cos = np.repeat(np.cos(pos).reshape(n, -1), 2, axis=-1)
    return jnp.asarray(np.concatenate([sin, cos], axis=-1))


def apply_rope_cat(x: jnp.ndarray, rope: jnp.ndarray) -> jnp.ndarray:
    """x: [..., N, dim]; rope: [N, 2*dim] (sin||cos).

    rot(x) pairs: (x0, x1) -> (-x1, x0) (reference embedding.py:261-269).
    """
    sin, cos = jnp.split(rope.astype(jnp.float32), 2, axis=-1)
    xf = x.astype(jnp.float32)
    x_even = xf[..., ::2]
    x_odd = xf[..., 1::2]
    rot = jnp.stack([-x_odd, x_even], axis=-1).reshape(xf.shape)
    return (xf * cos + rot * sin).astype(x.dtype)


def apply_rope_cat_prefixed(x: jnp.ndarray, rope: jnp.ndarray, n_prefix: int) -> jnp.ndarray:
    """2-D ViT rope over [B, S, H, dim] with the first `n_prefix` tokens
    (cls/registers) left unrotated (reference attention.py:136-148).

    TPU formulation (3x the naive one, measured v5e @ B=512 T=197):
      - the table is padded to full length with identity rows (sin=0, cos=1)
        instead of concatenating rotated/unrotated slices on the seq dim;
      - the pair rotation rides the MXU as a matmul against a constant ±1
        permutation matrix instead of stride-2 lane shuffles (slow on VPU);
      - the elementwise combine runs on the flattened [B, S, H*d] layout
        with head-tiled tables: d=64 is half a TPU lane width, so the
        4-D broadcast wastes every other lane (flat 1.91 ms vs 4-D
        2.28 ms per application).
    Bit-exact vs apply_rope_cat (R rows are signed one-hots).
    """
    B, S, H, dim = x.shape
    sin, cos = jnp.split(rope.astype(jnp.float32), 2, axis=-1)
    if n_prefix:
        sin = jnp.concatenate([jnp.zeros((n_prefix, dim), jnp.float32), sin], axis=0)
        cos = jnp.concatenate([jnp.ones((n_prefix, dim), jnp.float32), cos], axis=0)
    sin_w = jnp.tile(sin, (1, H))  # [S, H*d]
    cos_w = jnp.tile(cos, (1, H))
    rot = (x @ jnp.asarray(_rot_matrix(dim, dim, interleaved=True), x.dtype)).reshape(B, S, H * dim)
    xf = x.reshape(B, S, H * dim)
    out = xf.astype(jnp.float32) * cos_w + rot.astype(jnp.float32) * sin_w
    return out.astype(x.dtype).reshape(B, S, H, dim)
