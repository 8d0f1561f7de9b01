"""Pallas TPU grouped matmul (gmm) for dropless MoE expert compute.

First-party equivalent of megablocks' block-sparse expert matmuls
(reference: layers/block.py:192-216 consumes megablocks dMoE; §2.9 of
SURVEY.md inventories it as a native dep needing a TPU-native rebuild).
XLA's `jax.lax.ragged_dot` provides the same semantics; this kernel
expresses the problem the dense-MXU way and matches it (v5e, full
dropless MoE layer fwd+bwd at the nomic-v2-moe geometry: 129 TFLOP/s on
the assignment-FLOPs basis for both; the capacity dispatch reaches 162
at cf=1.25 by skipping the alignment padding, at the cost of drops).
The layout trick:

  rows are laid out grouped by expert with every group start aligned to
  `block_m`, so each (block_m x K) tile belongs to exactly ONE expert and
  the kernel is a plain MXU matmul whose rhs block index is looked up in
  a scalar-prefetched block->expert table. Padding rows inside a group's
  last tile are zero and produce zero outputs.

API:
  gmm(lhs [M, K], rhs [E, K, N], group_sizes [E]) -> [M, N]
    group_sizes are the PADDED per-expert row counts (each a multiple of
    block_m, summing to <= M; trailing rows belong to no group and map to
    the last expert — callers keep them zero). Differentiable in lhs and
    rhs (custom VJP: dlhs = gmm(dout, rhs^T), drhs = tgmm accumulation).
  aligned_group_layout(...) builds the permutation + padded sizes from a
    flat expert-assignment vector (the dropless dispatch helper).

Off-TPU the public gmm() lowers to jax.lax.ragged_dot (identical
semantics on the aligned layout), keeping CPU tests and the virtual-mesh
suite on the supported path; set CONTRASTORS_TPU_GMM_INTERPRET=1 to force
the Pallas interpreter for kernel parity tests.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_kernel() -> bool:
    if jax.default_backend() == "tpu":
        return True
    return os.environ.get("CONTRASTORS_TPU_GMM_INTERPRET", "0") == "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_experts(group_sizes: jnp.ndarray, num_blocks: int, block_m: int):
    """(block -> owning expert id, block -> active flag). group_sizes are
    block_m-aligned; empty groups own no blocks; trailing blocks past the
    last group map to the last expert with active=0 — the kernels skip
    their matmuls entirely and zero-fill (the rows are padding), so the
    E*block_m worst-case alignment tail costs DMA but no MXU time."""
    offsets = jnp.cumsum(group_sizes) - group_sizes  # [E] aligned starts
    starts = jnp.arange(num_blocks, dtype=jnp.int32) * block_m
    # last e with offsets[e] <= start, skipping empty groups (equal offsets)
    blk_e = (
        jnp.searchsorted(offsets, starts, side="right").astype(jnp.int32) - 1
    ).clip(0)
    active = (starts < jnp.sum(group_sizes)).astype(jnp.int32)
    return blk_e, active


# ---------------------------------------------------------------------------
# forward kernel: out[i*bm:(i+1)*bm, j*bn:(j+1)*bn] = lhs_block @ rhs[e]
# ---------------------------------------------------------------------------


def _gmm_kernel(blk_e_ref, act_ref, lhs_ref, rhs_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(act_ref[i] == 1)
    def _compute():
        out_ref[...] = jax.lax.dot_general(
            lhs_ref[...],
            rhs_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    @pl.when(act_ref[i] == 0)
    def _padding():
        out_ref[...] = jnp.zeros_like(out_ref)


def _gmm_call(lhs, rhs, blk_e, act, block_m, block_n):
    # grid (n, m) with m innermost: groups are contiguous in m, so the rhs
    # block index (be[i], 0, j) only changes at expert boundaries and the
    # resident expert panel is reused across the whole group — rhs traffic
    # drops from nb_m*N*K to ~E*N*K per call
    M, K = lhs.shape
    E, _, N = rhs.shape
    nb_m, nb_n = M // block_m, N // block_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_n, nb_m),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i, be, act: (i, 0)),
            pl.BlockSpec((None, K, block_n), lambda j, i, be, act: (be[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i, be, act: (i, j)),
    )
    return pl.pallas_call(
        _gmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), lhs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=_interpret(),
    )(blk_e, act, lhs, rhs)


# ---------------------------------------------------------------------------
# transposed kernel for drhs: drhs[e] = sum over e's blocks of lhs_b^T @ do_b
# ---------------------------------------------------------------------------


def _tgmm_kernel(blk_e_ref, act_ref, lhs_ref, dout_ref, drhs_ref, acc_scr, *, nb_m):
    i = pl.program_id(1)  # m block (innermost -> consecutive per expert)

    first = i == 0
    if nb_m > 1:
        first = first | (blk_e_ref[i] != blk_e_ref[jnp.maximum(i - 1, 0)])

    @pl.when(first)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # inactive (pure alignment-padding) blocks contribute exactly zero —
    # skip their MXU work
    @pl.when(act_ref[i] == 1)
    def _accum():
        acc_scr[...] += jax.lax.dot_general(
            lhs_ref[...],
            dout_ref[...],
            (((0,), (0,)), ((), ())),  # contract the row dim: [K, bn]
            preferred_element_type=jnp.float32,
        )

    last = i == nb_m - 1
    if nb_m > 1:
        last = last | (blk_e_ref[jnp.minimum(i + 1, nb_m - 1)] != blk_e_ref[i])

    @pl.when(last)
    def _flush():
        drhs_ref[...] = acc_scr[...].astype(drhs_ref.dtype)


def _tgmm_call(lhs, dout, blk_e, act, E, block_m, block_n):
    M, K = lhs.shape
    N = dout.shape[1]
    nb_m, nb_n = M // block_m, N // block_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_n, nb_m),  # m innermost: same-expert blocks consecutive
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i, be, act: (i, 0)),
            pl.BlockSpec((block_m, block_n), lambda j, i, be, act: (i, j)),
        ],
        out_specs=pl.BlockSpec((None, K, block_n), lambda j, i, be, act: (be[i], 0, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_tgmm_kernel, nb_m=nb_m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, K, N), lhs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=_interpret(),
    )(blk_e, act, lhs, dout)
    return out


# ---------------------------------------------------------------------------
# public differentiable gmm
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gmm(lhs, rhs, group_sizes, block_m, block_n):
    blk_e, act = _block_experts(group_sizes, lhs.shape[0] // block_m, block_m)
    return _gmm_call(lhs, rhs, blk_e, act, block_m, block_n)


def _gmm_fwd(lhs, rhs, group_sizes, block_m, block_n):
    return _gmm(lhs, rhs, group_sizes, block_m, block_n), (lhs, rhs, group_sizes)


def _pick_block(dim: int, target: int) -> int:
    """Largest lane-aligned divisor of dim not exceeding target (VMEM
    scratch for tgmm is K x block_n fp32 and must stay under ~16 MB)."""
    for b in range(min(target, dim), 127, -128):
        if dim % b == 0:
            return b
    return dim


def _gmm_bwd(block_m, block_n, res, dout):
    lhs, rhs, group_sizes = res
    E, K, N = rhs.shape
    nb_m = lhs.shape[0] // block_m
    blk_e, act = _block_experts(group_sizes, nb_m, block_m)
    # dlhs: same grouped matmul against rhs^T ([E, N, K])
    rhs_t = jnp.swapaxes(rhs, 1, 2)
    dlhs = _gmm_call(dout.astype(rhs_t.dtype), rhs_t, blk_e, act, block_m, _pick_block(K, block_n))
    # drhs: per-expert accumulation of lhs_block^T @ dout_block
    bn = _pick_block(N, max(128, (3 * 2**20) // (4 * K) // 128 * 128))
    drhs = _tgmm_call(lhs, dout.astype(lhs.dtype), blk_e, act, E, block_m, bn)
    # experts that own no rows were never visited -> mask garbage to zero
    drhs = jnp.where((group_sizes > 0)[:, None, None], drhs, 0.0).astype(rhs.dtype)
    return dlhs.astype(lhs.dtype), drhs, None


_gmm.defvjp(_gmm_fwd, _gmm_bwd)


def gmm(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    group_sizes: jnp.ndarray,
    block_m: int = 128,
    block_n: int = 512,
) -> jnp.ndarray:
    """Grouped matmul over a block_m-aligned expert-sorted row layout.

    lhs [M, K] (M a multiple of block_m), rhs [E, K, N], group_sizes [E]
    block_m-aligned padded counts. Returns [M, N]. Off-TPU this lowers to
    jax.lax.ragged_dot (same semantics on the aligned layout)."""
    M, K = lhs.shape
    E, _, N = rhs.shape
    if M % block_m:
        raise ValueError(f"M={M} must be a multiple of block_m={block_m}")
    # lane-dim alignment: Mosaic wants K and N in whole 128-lane tiles; toy
    # geometries fall back to ragged_dot (numerically interchangeable)
    if K % 128 or N % 128 or not _use_kernel():
        return jax.lax.ragged_dot(lhs, rhs, group_sizes.astype(jnp.int32))
    # non-divisible N: pick the widest lane-aligned divisor instead of the
    # full width (a K x N rhs panel can blow the 16 MB VMEM budget)
    bn = block_n if N % block_n == 0 else _pick_block(N, block_n)
    return _gmm(lhs, rhs, group_sizes.astype(jnp.int32), block_m, bn)


def aligned_group_layout(
    flat_e: jnp.ndarray, num_groups: int, block_m: int, src_of=None, sentinel: Optional[int] = None
):
    """Dropless dispatch layout: place the A = len(flat_e) assignments in
    expert-sorted order with every group start aligned to block_m.

    Returns (dest [A], group_sizes_padded [E], num_rows P) — plus, when
    `src_of` [A] is given (the source token id of each assignment), a
    fourth element `src` [P] mapping each aligned row to its source token,
    with `sentinel` at padding rows (callers point it at an appended zero
    row). Building xs as a GATHER `x_pad[src]` replaces the [P, D] float
    scatter with a [P] int scatter + row gather — cheaper on TPU, where
    scatters serialize (round-3 dropless-gap work).

    dest[a] = destination row of assignment a (original order) in the
    [P, ...] aligned buffer; P is static: round_up(A, bm) + E*bm covers
    the worst-case per-group padding. Rows not hit by any assignment are
    padding (zeros via the gather sentinel / scatter-into-zeros).
    """
    A = flat_e.shape[0]
    E = num_groups
    g = jnp.bincount(flat_e, length=E)  # true sizes
    gp = ((g + block_m - 1) // block_m) * block_m  # padded sizes
    off = jnp.cumsum(gp) - gp  # aligned starts
    uoff = jnp.cumsum(g) - g  # unpadded starts within sorted order
    order = jnp.argsort(flat_e)  # stable
    e_sorted = jnp.take(flat_e, order)
    # rank of each sorted assignment within its group
    rank = jnp.arange(A, dtype=jnp.int32) - jnp.take(uoff, e_sorted).astype(jnp.int32)
    dest_sorted = jnp.take(off, e_sorted).astype(jnp.int32) + rank
    dest = jnp.zeros((A,), jnp.int32).at[order].set(dest_sorted)
    P = (A + block_m - 1) // block_m * block_m + E * block_m
    if src_of is None:
        return dest, gp.astype(jnp.int32), P
    if sentinel is None:
        # no safe default exists: padding rows gather src[sentinel], so the
        # caller must guarantee that index is a zero row (e.g. an appended
        # zeros row at index N) or drhs silently absorbs a real token's
        # activations on every alignment-padding row
        raise ValueError("aligned_group_layout: sentinel is required with src_of")
    src = jnp.full((P,), sentinel, jnp.int32).at[dest].set(src_of.astype(jnp.int32))
    return dest, gp.astype(jnp.int32), P, src
