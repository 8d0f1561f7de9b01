"""Pallas grouped matmul (ops/grouped_matmul.py): parity vs
jax.lax.ragged_dot on the aligned layout, gradients, and the dispatch
layout helper. Runs the kernel in interpreter mode off-TPU."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from contrastors_tpu.ops.grouped_matmul import (
    _block_experts,
    aligned_group_layout,
    gmm,
)


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setenv("CONTRASTORS_TPU_GMM_INTERPRET", "1")


def _random_problem(seed=0, E=4, K=128, N=128, bm=8):
    rng = np.random.default_rng(seed)
    # padded group sizes, multiples of bm, one empty group
    gp = np.array([2 * bm, 0, 3 * bm, bm], np.int32)[:E]
    M = int(gp.sum()) + 2 * bm  # trailing rows belong to no group
    lhs = np.zeros((M, K), np.float32)
    lhs[: gp.sum()] = rng.normal(size=(int(gp.sum()), K)).astype(np.float32)
    rhs = rng.normal(size=(E, K, N)).astype(np.float32)
    return jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(gp), bm


def test_block_experts_map():
    gp = jnp.asarray([16, 0, 24, 8], jnp.int32)
    blk, act = _block_experts(gp, 8, 8)
    # rows: [0,16) -> e0, [16,40) -> e2 (e1 empty), [40,48) -> e3, rest e3
    np.testing.assert_array_equal(np.asarray(blk), [0, 0, 2, 2, 2, 3, 3, 3])
    # trailing blocks past sum(gp)=48 are pure padding: compute-skipped
    np.testing.assert_array_equal(np.asarray(act), [1, 1, 1, 1, 1, 1, 0, 0])


def test_aligned_group_layout_src_gather():
    """src (row -> source token) inverts dest and sentinels padding rows,
    so xs = x_pad[src] equals the scatter construction exactly."""
    rng = np.random.default_rng(3)
    E, bm, N, k = 4, 8, 16, 2
    flat_e = jnp.asarray(rng.integers(0, E, size=N * k), jnp.int32)
    token_of = jnp.repeat(jnp.arange(N, dtype=jnp.int32), k)
    from contrastors_tpu.ops.grouped_matmul import aligned_group_layout

    # sentinel is mandatory with src_of: a default of 0 would gather token
    # 0's real activations into padding rows (corrupting drhs grads)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sentinel"):
        aligned_group_layout(flat_e, E, bm, src_of=token_of)

    dest, gp, P, src = aligned_group_layout(flat_e, E, bm, src_of=token_of, sentinel=N)
    src = np.asarray(src)
    dest = np.asarray(dest)
    np.testing.assert_array_equal(src[dest], np.asarray(token_of))
    pad_rows = np.setdiff1d(np.arange(P), dest)
    assert (src[pad_rows] == N).all()

    x = rng.standard_normal((N, 5)).astype(np.float32)
    x_pad = np.concatenate([x, np.zeros((1, 5), np.float32)])
    xs_gather = x_pad[src]
    xs_scatter = np.zeros((P, 5), np.float32)
    xs_scatter[dest] = x[np.asarray(token_of)]
    np.testing.assert_array_equal(xs_gather, xs_scatter)


def test_gmm_matches_ragged_dot(interpret_kernel):
    lhs, rhs, gp, bm = _random_problem()
    out_k = gmm(lhs, rhs, gp, block_m=bm)
    out_r = jax.lax.ragged_dot(lhs, rhs, gp)
    rows = int(np.asarray(gp).sum())
    np.testing.assert_allclose(
        np.asarray(out_k)[:rows], np.asarray(out_r)[:rows], rtol=1e-5, atol=1e-5
    )


def test_gmm_grads_match_ragged_dot(interpret_kernel):
    lhs, rhs, gp, bm = _random_problem(seed=1)
    rows = int(np.asarray(gp).sum())

    def loss_k(lhs, rhs):
        return jnp.sum(gmm(lhs, rhs, gp, block_m=bm) ** 2)

    def loss_r(lhs, rhs):
        return jnp.sum(jax.lax.ragged_dot(lhs, rhs, gp) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(lhs, rhs)
    gr = jax.grad(loss_r, argnums=(0, 1))(lhs, rhs)
    np.testing.assert_allclose(
        np.asarray(gk[0])[:rows], np.asarray(gr[0])[:rows], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-4)
    # the empty group's weight grad is exactly zero
    assert float(np.abs(np.asarray(gk[1])[1]).max()) == 0.0


def test_gmm_rejects_misaligned_rows():
    lhs = jnp.zeros((100, 64))
    rhs = jnp.zeros((2, 64, 128))
    with pytest.raises(ValueError, match="multiple of block_m"):
        gmm(lhs, rhs, jnp.asarray([64, 32], jnp.int32), block_m=64)


def test_aligned_group_layout_properties():
    rng = np.random.default_rng(2)
    E, bm, A = 5, 8, 100
    flat_e = jnp.asarray(rng.integers(0, E, size=A), jnp.int32)
    dest, gp, P = aligned_group_layout(flat_e, E, bm)
    dest_np, gp_np = np.asarray(dest), np.asarray(gp)
    # every padded size is block-aligned and covers the true counts
    counts = np.bincount(np.asarray(flat_e), minlength=E)
    assert (gp_np % bm == 0).all()
    assert (gp_np >= counts).all()
    # destinations are unique, in range, and land in their expert's span
    assert len(set(dest_np.tolist())) == A
    assert dest_np.min() >= 0 and dest_np.max() < P
    off = np.cumsum(gp_np) - gp_np
    for a in range(A):
        e = int(np.asarray(flat_e)[a])
        assert off[e] <= dest_np[a] < off[e] + counts[e]
    # P is static and block-aligned
    assert P % bm == 0 and P >= int(gp_np.sum())


def test_moe_dropless_kernel_path_matches_fallback(interpret_kernel):
    """MoEMLP dropless through the interpreted Pallas kernel equals the
    ragged_dot fallback (same params, same routing)."""
    import contrastors_tpu.ops.grouped_matmul as gmod
    from contrastors_tpu.layers.moe import MoEMLP
    from contrastors_tpu.models.model_config import TrunkConfig

    cfg = TrunkConfig(
        n_embd=128, n_layer=1, n_head=2, n_inner=256, vocab_size=64, pad_token_id=0,
        n_positions=16, activation_function="swiglu", num_experts=4, moe_top_k=2,
        moe_impl="dropless", attn_impl="sdpa",
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 128)), jnp.float32)
    mask = jnp.ones((2, 8), jnp.int32)
    m = MoEMLP(config=cfg)
    params = m.init(jax.random.PRNGKey(0), x, attention_mask=mask)
    out_k, _ = m.apply(params, x, attention_mask=mask)

    orig = gmod._use_kernel
    gmod._use_kernel = lambda: False
    try:
        out_r, _ = m.apply(params, x, attention_mask=mask)
    finally:
        gmod._use_kernel = orig
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), rtol=1e-5, atol=1e-5)
