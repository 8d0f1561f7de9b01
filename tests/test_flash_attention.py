"""Pallas flash attention vs the SDPA oracle (interpret mode on CPU).

Parity bar follows the reference's kernel criterion
(reference tests/test_flash_bert.py:77-82): fp32 near-exact, bf16 within
3x the dtype noise floor. Forward and backward, causal/bidirectional,
padding masks, and packed segment ids.
"""

import os

os.environ["CONTRASTORS_TPU_FLASH_INTERPRET"] = "1"  # exercise the kernel via the interpreter off-TPU

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from contrastors_tpu.ops.flash_attention import flash_attention
from contrastors_tpu.ops.sdpa import sdpa


def make_qkv(rng, B=2, S=256, H=4, D=64, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_forward_matches_sdpa(causal):
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng)
    out_f = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128)
    out_s = sdpa(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), atol=2e-5)


def test_flash_forward_with_padding_mask():
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng, B=3, S=256)
    lengths = np.array([256, 130, 7])
    mask = jnp.asarray((np.arange(256)[None, :] < lengths[:, None]).astype(np.int32))
    out_f = flash_attention(q, k, v, attention_mask=mask, block_q=128, block_kv=128)
    out_s = sdpa(q, k, v, attention_mask=mask)
    valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out_f) * valid, np.asarray(out_s) * valid, atol=2e-5
    )


def test_flash_forward_segment_ids_packing():
    """Packed sequences: attention only within equal segments — the
    static-shape replacement for flash-attn varlen/cu_seqlens."""
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, B=2, S=256)
    seg = np.zeros((2, 256), dtype=np.int32)
    seg[0, :100] = 1
    seg[0, 100:200] = 2
    seg[1, :256] = 1
    seg = jnp.asarray(seg)
    out_f = flash_attention(q, k, v, segment_ids=seg, block_q=128, block_kv=128)
    out_s = sdpa(q, k, v, segment_ids=seg)
    valid = (np.asarray(seg) != 0)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out_f) * valid, np.asarray(out_s) * valid, atol=2e-5
    )


def test_flash_forward_unaligned_seqlen():
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, S=200)  # forces padding to block multiple
    out_f = flash_attention(q, k, v, block_q=128, block_kv=128)
    out_s = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), atol=2e-5)


def test_flash_single_pass_remainder_subblock():
    """Regression: S in (256, 512] resolves block_q to 384/512 on the
    single-pass path; the sub-block pipeline must cover the trailing
    remainder rows (a 384 block once dropped rows 256..383 entirely)."""
    for S in (384, 320, 512):
        rng = np.random.default_rng(S)
        q, k, v = make_qkv(rng, S=S)
        out_f = flash_attention(q, k, v)
        out_s = sdpa(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_s), atol=2e-5, err_msg=f"S={S}"
        )

        def loss_flash(q):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def loss_sdpa(q):
            return jnp.sum(sdpa(q, k, v) ** 2)

        gf = jax.grad(loss_flash)(q)
        gs = jax.grad(loss_sdpa)(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), atol=5e-4, err_msg=f"S={S}")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_matches_sdpa(causal):
    rng = np.random.default_rng(4)
    q, k, v = make_qkv(rng, B=2, S=256)
    lengths = np.array([256, 180])
    mask = jnp.asarray((np.arange(256)[None, :] < lengths[:, None]).astype(np.int32))
    mf = np.asarray(mask)[:, :, None, None].astype(np.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, attention_mask=mask, causal=causal, block_q=128, block_kv=128)
        return jnp.sum((o * mf) ** 2)

    def loss_sdpa(q, k, v):
        o = sdpa(q, k, v, attention_mask=mask, causal=causal)
        return jnp.sum((o * mf) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_sdpa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)


def test_flash_bf16_noise_floor():
    rng = np.random.default_rng(5)
    q, k, v = make_qkv(rng)
    gold = sdpa(q, k, v)
    noise = np.abs(
        np.asarray(sdpa(*(x.astype(jnp.bfloat16) for x in (q, k, v))), dtype=np.float32)
        - np.asarray(gold)
    ).max()
    out = flash_attention(
        *(x.astype(jnp.bfloat16) for x in (q, k, v)), block_q=128, block_kv=128
    )
    err = np.abs(np.asarray(out, dtype=np.float32) - np.asarray(gold)).max()
    assert err < 3 * max(noise, 1e-6), f"bf16 flash err {err} vs noise {noise}"


def test_dispatch_threshold_in_model():
    """attention_core picks flash only at kv >= flash_min_seq: the jaxpr of
    a long-seq model contains a pallas_call, the short-seq one doesn't."""
    from contrastors_tpu.models.model_config import TrunkConfig
    from contrastors_tpu.models.nomic_bert import NomicBertModel

    def has_pallas(seq):
        cfg = TrunkConfig(
            n_embd=128, n_layer=1, n_head=2, n_inner=256, vocab_size=128,
            n_positions=0, rotary_emb_fraction=1.0, pad_token_id=0,
            attn_impl="flash",
        )
        model = NomicBertModel(config=cfg)
        ids = jnp.ones((1, seq), jnp.int32)
        mask = jnp.ones_like(ids)
        params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids, mask))
        import flax

        params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
        jaxpr = jax.make_jaxpr(lambda p: model.apply(p, ids, mask)["last_hidden_state"])(params)
        return "pallas_call" in str(jaxpr)

    assert has_pallas(1024), "long sequences must lower to the Pallas kernel"
    assert not has_pallas(256), "short sequences must stay on the SDPA path"


@pytest.mark.parametrize("hkv", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_gqa_matches_sdpa(causal, hkv):
    """GQA/MQA in-kernel path (Llama geometry: H=8 q heads over Hkv kv
    heads) — forward AND backward vs the repeat-kv SDPA oracle."""
    rng = np.random.default_rng(11)
    B, S, H, D = 2, 256, 8, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, hkv, D)), jnp.float32)
    lengths = [S, S - 77]
    mask = jnp.asarray(np.array([[1] * l + [0] * (S - l) for l in lengths]), jnp.int32)

    def f_flash(q, k, v):
        out = flash_attention(q, k, v, attention_mask=mask, causal=causal, block_q=128, block_kv=128)
        return (out * mask[:, :, None, None]).astype(jnp.float32).sum(), out

    def f_sdpa(q, k, v):
        out = sdpa(q, k, v, attention_mask=mask, causal=causal)
        return (out * mask[:, :, None, None]).astype(jnp.float32).sum(), out

    (_, out_f), grads_f = jax.value_and_grad(f_flash, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, out_s), grads_s = jax.value_and_grad(f_sdpa, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    for b, l in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out_f)[b, :l], np.asarray(out_s)[b, :l], atol=2e-5, rtol=1e-4
        )
    for gf, gs, name in zip(grads_f, grads_s, "qkv"):
        assert gf.shape == gs.shape, name
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), atol=5e-5, rtol=1e-3, err_msg=name)


def test_flash_sliding_window_matches_sdpa():
    """Sliding-window (ModernBERT local attention) fwd+bwd parity, with a
    window small enough that far kv blocks are skipped entirely."""
    rng = np.random.default_rng(21)
    B, S, H, D = 2, 512, 4, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * S, [1] * 300 + [0] * (S - 300)]), jnp.int32)
    W = 128  # total window; blocks of 128 -> off-band blocks skipped

    def lf(q, k, v):
        o = flash_attention(q, k, v, attention_mask=mask, window=W, block_q=128, block_kv=128)
        return jnp.sum((o * mask[:, :, None, None]) ** 2), o

    def ls(q, k, v):
        o = sdpa(q, k, v, attention_mask=mask, window=W)
        return jnp.sum((o * mask[:, :, None, None]) ** 2), o

    (_, of), gf = jax.value_and_grad(lf, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, os), gs = jax.value_and_grad(ls, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(of) * valid, np.asarray(os) * valid, atol=2e-5)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=name)

    # the window actually restricts attention (differs from global)
    o_global = sdpa(q, k, v, attention_mask=mask)
    assert not np.allclose(np.asarray(os), np.asarray(o_global), atol=1e-3)


def test_flash_causal_cross_attention_bottom_right():
    """causal with S != T must be bottom-right aligned (query i attends
    keys up to i + (T - S)), matching SDPA and flash-attn >= 2.1; the
    kernel was top-left aligned."""
    rng = np.random.default_rng(11)
    B, S, T, H, D = 2, 128, 384, 4, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    out_f = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
    out_s = sdpa(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_s, np.float32), atol=2e-2
    )

    def loss_f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128, block_kv=128).astype(jnp.float32) ** 2)

    def loss_s(q, k, v):
        return jnp.sum(sdpa(q, k, v, causal=True).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-2, err_msg=name
        )


def test_flash_fully_masked_row_gradients_zero():
    """A query row with NO valid keys stores lse = -inf; the backward once
    reconstructed p = exp2(-inf - -inf) = 1 across the row, injecting
    garbage into dk/dv whenever that row's cotangent was nonzero. The true
    gradient through a masked row (forward output 0) is exactly zero."""
    rng = np.random.default_rng(12)
    B, S, H, D = 1, 128, 2, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    seg = np.ones((B, S), np.int32)
    seg[:, 64:] = 2  # two segments
    segq = seg.copy()
    segq[:, 96:] = 0  # rows 96.. are padding -> no valid keys for them? no:
    # make rows 96.. belong to a segment id with NO kv rows at all
    segq[:, 96:] = 7
    segq_j, seg_j = jnp.asarray(segq), jnp.asarray(seg)

    def loss_f(k, v):
        # cotangent deliberately nonzero on EVERY row, including masked ones
        o = flash_attention(q, k, v, segment_ids=segq_j, kv_segment_ids=seg_j,
                            block_q=128, block_kv=128)
        return jnp.sum(o.astype(jnp.float32))

    def loss_s(k, v):
        o = sdpa(q, k, v, segment_ids=segq_j, kv_segment_ids=seg_j)
        # SDPA's masked rows yield an arbitrary uniform blend; zero them to
        # encode the contract before summing
        w = jnp.asarray((segq == 7), jnp.float32)[:, :, None, None]
        return jnp.sum(o.astype(jnp.float32) * (1.0 - w))

    gk_f, gv_f = jax.grad(loss_f, argnums=(0, 1))(k, v)
    gk_s, gv_s = jax.grad(loss_s, argnums=(0, 1))(k, v)
    assert np.isfinite(np.asarray(gk_f, np.float32)).all()
    # bf16 column sums over 64 rows: noise floor ~8e-3
    np.testing.assert_allclose(
        np.asarray(gv_f, np.float32), np.asarray(gv_s, np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(gk_f, np.float32), np.asarray(gk_s, np.float32), atol=2e-2
    )


# ---------------------------------------------------------------------------
# fused in-kernel rotary (round 4): flash(rotary_cos/sin) must match
# apply_rotary-then-flash exactly — forward AND gradients (the kernels
# recompute the rotation in the backward and apply the exact adjoint
# g -> g*cos + (g*sin) @ R^T to the accumulated dq/dk).
# ---------------------------------------------------------------------------

from contrastors_tpu.layers.rotary import apply_rotary, rotary_cos_sin


def _fused_vs_outside(q, k, v, cos, sin, *, interleaved=False, position_ids=None,
                      causal=False, mask=None, block_q=128, block_kv=128,
                      atol_fwd=2e-5, atol_bwd=5e-4):
    def loss_fused(q, k, v):
        o = flash_attention(
            q, k, v, attention_mask=mask, causal=causal,
            block_q=block_q, block_kv=block_kv,
            rotary_cos=cos, rotary_sin=sin, rotary_interleaved=interleaved,
            rotary_position_ids=position_ids,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2), o

    def loss_outside(q, k, v):
        qr = apply_rotary(q, cos, sin, interleaved, position_ids)
        kr = apply_rotary(k, cos, sin, interleaved, position_ids)
        o = flash_attention(qr, kr, v, attention_mask=mask, causal=causal,
                            block_q=block_q, block_kv=block_kv)
        return jnp.sum(o.astype(jnp.float32) ** 2), o

    (_, of), gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, os_), gs = jax.value_and_grad(loss_outside, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(of), np.asarray(os_), atol=atol_fwd)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol_bwd, err_msg=name)


@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_fused_rotary_matches_outside(causal, interleaved):
    rng = np.random.default_rng(31)
    q, k, v = make_qkv(rng, B=2, S=256)
    cos, sin = rotary_cos_sin(256, 64)
    _fused_vs_outside(q, k, v, cos, sin, interleaved=interleaved, causal=causal)


def test_flash_fused_rotary_partial_dim_and_mask():
    """rot_dim < head_dim (pass-through tail stays unrotated) + padding
    mask, on the multi-pass kernel path (block_kv < T)."""
    rng = np.random.default_rng(32)
    q, k, v = make_qkv(rng, B=2, S=256)
    cos, sin = rotary_cos_sin(256, 32)  # rotate first 32 of 64 features
    lengths = np.array([256, 130])
    mask = jnp.asarray((np.arange(256)[None, :] < lengths[:, None]).astype(np.int32))
    _fused_vs_outside(q, k, v, cos, sin, mask=mask, block_q=128, block_kv=64)


def test_flash_fused_rotary_multiblock_kernel():
    """T > block_kv exercises _fwd_kernel (online softmax) with the
    rotated-q scratch refreshed per q block."""
    rng = np.random.default_rng(33)
    q, k, v = make_qkv(rng, B=1, S=512)
    cos, sin = rotary_cos_sin(512, 64)
    _fused_vs_outside(q, k, v, cos, sin, causal=True, block_q=128, block_kv=128)


def test_flash_fused_rotary_gqa():
    rng = np.random.default_rng(34)
    B, S, H, D = 2, 256, 8, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, 2, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, 2, D)), jnp.float32)
    cos, sin = rotary_cos_sin(S, D)
    _fused_vs_outside(q, k, v, cos, sin)


def test_flash_fused_rotary_packed_position_ids():
    """Packed sequences: positions restart at segment starts; the fused
    path gathers per-batch [B, S, D] tables and the kernels index them by
    (batch, block)."""
    rng = np.random.default_rng(35)
    q, k, v = make_qkv(rng, B=2, S=256)
    seg = np.zeros((2, 256), np.int32)
    seg[0, :100] = 1
    seg[0, 100:200] = 2
    seg[1, :256] = 1
    pos = np.zeros((2, 256), np.int32)
    pos[0, :100] = np.arange(100)
    pos[0, 100:200] = np.arange(100)
    pos[1] = np.arange(256)
    seg_j = jnp.asarray(seg)
    pos_j = jnp.asarray(pos)
    cos, sin = rotary_cos_sin(256, 64)

    def loss_fused(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg_j, block_q=128, block_kv=128,
                            rotary_cos=cos, rotary_sin=sin, rotary_position_ids=pos_j)
        valid = (seg_j != 0)[:, :, None, None]
        return jnp.sum((o * valid).astype(jnp.float32) ** 2), o

    def loss_outside(q, k, v):
        qr = apply_rotary(q, cos, sin, position_ids=pos_j)
        kr = apply_rotary(k, cos, sin, position_ids=pos_j)
        o = flash_attention(qr, kr, v, segment_ids=seg_j, block_q=128, block_kv=128)
        valid = (seg_j != 0)[:, :, None, None]
        return jnp.sum((o * valid).astype(jnp.float32) ** 2), o

    (_, of), gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, os_), gs = jax.value_and_grad(loss_outside, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    valid = (seg != 0)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(of) * valid, np.asarray(os_) * valid, atol=2e-5)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)


def test_flash_fused_rotary_unaligned_seqlen():
    """S not a block multiple: the wrapper pads q/k/v AND the expanded
    tables (identity rows) together."""
    rng = np.random.default_rng(36)
    q, k, v = make_qkv(rng, S=200)
    cos, sin = rotary_cos_sin(200, 64)
    _fused_vs_outside(q, k, v, cos, sin, block_q=128, block_kv=128)


def test_flash_fused_rotary_packed_unequal_block_pads():
    """round_up(S, block_kv) > round_up(S, block_q) on the packed path:
    the kv-side BlockSpec walks T_pad rows, so the position-gathered
    [B, S, D] tables must be padded to max(S_pad, T_pad) or the kernel
    reads blocks past the table's end (round-4 advisor finding)."""
    rng = np.random.default_rng(37)
    S = 300  # S_pad = 384 at block_q=128, T_pad = 512 at block_kv=256
    q, k, v = make_qkv(rng, B=2, S=S)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (2, 1))
    cos, sin = rotary_cos_sin(S, 64)
    _fused_vs_outside(q, k, v, cos, sin, position_ids=pos, block_q=128, block_kv=256)


def test_flash_fused_rotary_cross_attention_position_ids_raises():
    """A [B, S] packed position table cannot rotate a length-T != S k; the
    wrapper must fail loudly instead of shape-erroring downstream."""
    rng = np.random.default_rng(38)
    B, S, T, H, D = 1, 128, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    cos, sin = rotary_cos_sin(T, D)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))
    with pytest.raises(ValueError, match="rotary_position_ids"):
        flash_attention(q, k, v, rotary_cos=cos, rotary_sin=sin, rotary_position_ids=pos)


def test_fused_rotary_model_wiring():
    """TrunkConfig.fused_rotary=True routes the layer's rotary tables into
    attention_core and through the kernel; outputs must match the default
    outside-rotary model exactly (same params)."""
    from contrastors_tpu.models.model_config import TrunkConfig
    from contrastors_tpu.models.nomic_bert import NomicBertModel

    rng = np.random.default_rng(41)
    # S=512 >= flash_min_seq so the kernel path (interpret mode) is taken
    ids = jnp.asarray(rng.integers(5, 120, size=(2, 512)), jnp.int32)
    mask = jnp.ones_like(ids)

    outs = {}
    for fused in (False, True):
        cfg = TrunkConfig(
            n_embd=128, n_layer=2, n_head=2, n_inner=256, vocab_size=128,
            n_positions=0, rotary_emb_fraction=1.0, pad_token_id=0,
            attn_impl="flash", flash_block_q=128, flash_block_kv=128,
            fused_rotary=fused,
        )
        model = NomicBertModel(config=cfg)
        params = model.init(jax.random.PRNGKey(7), ids, mask)
        outs[fused] = np.asarray(
            model.apply(params, ids, mask)["last_hidden_state"]
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5)
