"""Rotary variants: plain RoPE vs HF, DynamicNTK scaling, llama3 bands."""

import numpy as np
import jax.numpy as jnp
import torch

from contrastors_tpu.layers.rotary import (
    apply_rope_cat,
    apply_rope_cat_prefixed,
    apply_rotary,
    build_2d_rope_cat,
    llama3_inv_freq,
    ntk_scaled_base,
    rotary_cos_sin,
    rotary_inv_freq,
)


def hf_rotate_half_apply(x, cos, sin):
    """HF neox-style rotary (transformers rotate_half) on [B, H, S, D]."""
    x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def test_apply_rotary_matches_hf_neox_convention():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 16, 3, 8
    x = rng.normal(size=(B, S, H, D)).astype(np.float32)
    cos, sin = rotary_cos_sin(S, D, base=10000.0)

    out = np.asarray(apply_rotary(jnp.asarray(x), cos, sin, interleaved=False))

    # HF layout: [B, H, S, D] with cos/sin duplicated across halves
    cos_t = torch.tensor(np.concatenate([np.asarray(cos)] * 2, axis=-1))[None, None]
    sin_t = torch.tensor(np.concatenate([np.asarray(sin)] * 2, axis=-1))[None, None]
    ref = hf_rotate_half_apply(torch.tensor(x.transpose(0, 2, 1, 3)), cos_t, sin_t)
    ref = ref.numpy().transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dynamic_ntk_base_scaling():
    """Base extension formula (reference embedding.py:809-818): unscaled
    inside the trained window, scaled beyond it."""
    base, dim, max_trained, factor = 10000.0, 64, 2048, 2.0
    assert ntk_scaled_base(base, dim, 1024, max_trained, factor) == base
    s = ntk_scaled_base(base, dim, 4096, max_trained, factor)
    expected = base * ((factor * 4096 / max_trained) - (factor - 1)) ** (dim / (dim - 2))
    assert abs(s - expected) < 1e-6 and s > base

    cos_short, _ = rotary_cos_sin(1024, dim, base, rotary_scaling_factor=factor, max_trained_positions=max_trained)
    cos_plain, _ = rotary_cos_sin(1024, dim, base)
    np.testing.assert_allclose(np.asarray(cos_short), np.asarray(cos_plain))


def test_llama3_inv_freq_matches_hf():
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    from transformers import LlamaConfig

    rope_scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    }
    cfg = LlamaConfig(
        hidden_size=64,
        num_attention_heads=4,
        rope_theta=500000.0,
        rope_scaling=rope_scaling,
        max_position_embeddings=131072,
    )
    hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](cfg, device="cpu")
    mine = llama3_inv_freq(16, 500000.0, rope_scaling)
    np.testing.assert_allclose(mine, hf_inv.numpy(), rtol=1e-6)


def test_rope_cat_prefixed_matches_naive_concat():
    """The MXU-matmul fast path (identity table rows for prefix tokens +
    sign-permutation pair rotation) must be bit-exact against the naive
    formulation: rotate x[:, n_prefix:] with apply_rope_cat, pass the
    prefix tokens through unchanged (reference attention.py:136-148)."""
    rng = np.random.default_rng(2)
    B, H, d, grid = 3, 4, 32, (5, 5)
    n_tok = grid[0] * grid[1]
    rope = build_2d_rope_cat(d, grid, ref_feat_shape=grid)
    for n_prefix in (0, 1, 3):
        S = n_tok + n_prefix
        x = jnp.asarray(rng.normal(size=(B, S, H, d)), jnp.bfloat16)
        fast = apply_rope_cat_prefixed(x, rope, n_prefix)
        # naive: [B, H, S, d] layout for apply_rope_cat, prefix concat
        body = apply_rope_cat(x[:, n_prefix:].swapaxes(1, 2), rope).swapaxes(1, 2)
        naive = jnp.concatenate([x[:, :n_prefix], body], axis=1) if n_prefix else body
        np.testing.assert_array_equal(
            np.asarray(fast, np.float32), np.asarray(naive, np.float32)
        )


def test_interleaved_rotary_pairs():
    """GPT-J interleaved convention rotates (even, odd) pairs."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 1, 4)).astype(np.float32)
    cos, sin = rotary_cos_sin(4, 4)
    out = np.asarray(apply_rotary(jnp.asarray(x), cos, sin, interleaved=True))
    c, s = np.asarray(cos), np.asarray(sin)
    # manual: pairs (x0,x1): x0' = x0*c - x1*s ; x1' = x1*c + x0*s
    for t in range(4):
        for p in range(2):
            x0, x1 = x[0, t, 0, 2 * p], x[0, t, 0, 2 * p + 1]
            np.testing.assert_allclose(out[0, t, 0, 2 * p], x0 * c[t, p] - x1 * s[t, p], atol=1e-6)
            np.testing.assert_allclose(out[0, t, 0, 2 * p + 1], x1 * c[t, p] + x0 * s[t, p], atol=1e-6)


def _naive_apply_rotary(x, cos, sin, interleaved, position_ids=None):
    """Reference slicing formulation (flash-attn convention) for the MXU
    paths to be checked against: rotate the first 2*cos.shape[-1] features,
    pass the tail through untouched."""
    rot_dim = cos.shape[-1] * 2
    if position_ids is not None:
        cos = cos[position_ids][:, :, None, :]
        sin = sin[position_ids][:, :, None, :]
    else:
        cos = cos[None, : x.shape[1], None, :]
        sin = sin[None, : x.shape[1], None, :]
    x_rot = x[..., :rot_dim].astype(jnp.float32)
    x_pass = x[..., rot_dim:]
    if interleaved:
        x1, x2 = x_rot[..., ::2], x_rot[..., 1::2]
        rotated = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).reshape(
            x_rot.shape
        )
    else:
        half = rot_dim // 2
        x1, x2 = x_rot[..., :half], x_rot[..., half:]
        rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    rotated = rotated.astype(x.dtype)
    return rotated if x_pass.shape[-1] == 0 else jnp.concatenate([rotated, x_pass], axis=-1)


def test_apply_rotary_mxu_matches_naive():
    """Both apply_rotary paths (static positions: flat head-tiled tables;
    position_ids gather: per-row expanded tables) use the signed-permutation
    MXU matmul and must be bit-exact against the naive slicing formulation
    for both pair conventions, partial rotary, both dtypes, and
    segment-restarting position ids."""
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 24, 3, 64
    pos_arange = jnp.broadcast_to(jnp.arange(S), (B, S))
    pos_packed = jnp.asarray(rng.integers(0, S + 8, size=(B, S)), jnp.int32)
    for rot_dim in (D, D // 2):
        cos, sin = rotary_cos_sin(S + 8, rot_dim, base=1000.0)
        for interleaved in (False, True):
            for dtype in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype)
                for pos in (None, pos_arange, pos_packed):
                    got = apply_rotary(x, cos, sin, interleaved, position_ids=pos)
                    want = _naive_apply_rotary(x, cos, sin, interleaved, position_ids=pos)
                    np.testing.assert_array_equal(
                        np.asarray(got, np.float32),
                        np.asarray(want, np.float32),
                        err_msg=f"rot_dim={rot_dim} il={interleaved} {dtype} pos={pos is not None}",
                    )
