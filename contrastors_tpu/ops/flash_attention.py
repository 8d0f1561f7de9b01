"""Pallas TPU flash attention (forward + backward).

First-party replacement for the flash-attn CUDA kernels the reference
consumes (reference: layers/attention.py:7-12,153-241). FlashAttention-2
style: online softmax over kv blocks, O(S) memory, LSE saved for a
recompute-based backward. Varlen/unpad is replaced by segment-ids masking
on static shapes — the TPU-native equivalent of cu_seqlens packing.

Public layout: q [B, S, H, D], k/v [B, T, Hkv, D] (MHA and GQA/MQA — kv
blocks are indexed by q_head // group in the BlockSpec index maps, the
TPU equivalent of the reference's kvpacked GQA path attention.py:183-214);
internally transposed to [B, H, S, D] so every block is a clean
(seq, head_dim) tile. Softmax runs in base 2 (log2(e) folded into the fp32
logit scaling) so the VPU transcendental is a bare exp2.
The wrapper pads S/T to block multiples and folds attention_mask into
kv segment ids. Softmax in fp32; p cast to v.dtype for the PV matmul
(same as the CUDA kernel's tensor-core path).

Backward follows FA-2's two-kernel split: dq accumulated over kv blocks,
dk/dv accumulated over q blocks, with delta = rowsum(dO * O) precomputed.

Fused rotary (round 4): the reference applies rotary inside its CUDA
kernels (reference: layers/embedding.py:618-745). When
`rotary_cos/rotary_sin` tables are passed, the kernels rotate q/k blocks
in-VMEM: the rotate-half permutation rides the MXU as a matmul against a
constant signed one-hot matrix R (layers/rotary.py), the elementwise
combine runs in fp32, and the backward kernels apply the exact adjoint
(g -> g*cos + (g*sin) @ R^T) to the accumulated dq/dk at finalize.
Numerically identical to apply_rotary-then-flash (fwd bit-exact on-chip).
OFF by default (TrunkConfig.fused_rotary): on v5e at D=64 the kernel is
matmul-bound, so the in-kernel re-rotation of k per q block (+D/block_q
extra MXU on the QK matmul) costs more than the ~one-HBM-round-trip the
fusion saves — measured 0.91x fwd at the MLM geometry, a wash on the full
MLM step (ROADMAP.md round-4 rotary-fusion ablation). Kept as a knob for
bandwidth-bound geometries/hardware where the trade flips.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _interpret_enabled() -> bool:
    """Off-TPU, the Pallas interpreter is only used when explicitly
    requested (kernel parity tests); models fall back to the numerically
    interchangeable SDPA path instead."""
    return os.environ.get("CONTRASTORS_TPU_FLASH_INTERPRET", "0") == "1"


def flash_shape_ok(q, k) -> bool:
    """Flash path requirements: q heads an integer multiple of kv heads
    (MHA or GQA/MQA — the kernel maps q head -> kv head in the index maps,
    reference kvpacked GQA path attention.py:183-214) and a lane-friendly
    head dim. head_dim < 64 (toy models) compiles pathologically slowly in
    Mosaic and gains nothing over the fused SDPA path, so it falls back."""
    return q.shape[2] % k.shape[2] == 0 and q.shape[3] % 8 == 0 and q.shape[3] >= 64


# ---------------------------------------------------------------------------
# in-kernel rotary helpers
# ---------------------------------------------------------------------------


def _rot_block(x, cos_t, sin_t, R):
    """In-VMEM rotary on a [rows, D] block: x*cos + (x@R)*sin, fp32 combine,
    cast back to x.dtype — the same rounding points as the outside MXU path
    (layers/rotary.py _apply_rotary_mxu: the R matmul is an exact signed
    copy in any dtype since entries are 0/±1), so numerics match."""
    xr = jax.lax.dot_general(
        x, R.astype(x.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (x.astype(jnp.float32) * cos_t + xr * sin_t).astype(x.dtype)


def _rot_adjoint(g, cos_t, sin_t, R):
    """Exact adjoint of _rot_block on an fp32 grad block:
    g -> g*cos + (g*sin) @ R^T (derivation in the module docstring)."""
    return g * cos_t + jax.lax.dot_general(
        g * sin_t, R, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tbl_spec(tbl, block, axis):
    """BlockSpec for an expanded cos/sin table on a (b, h, i, j) grid.
    2-D [S_pad, D] tables are position-shared; 3-D [B, S_pad, D] tables are
    per-batch (packed position_ids). `axis` picks which grid dim walks the
    sequence: 2 = q blocks (i), 3 = kv blocks (j)."""
    D = tbl.shape[-1]
    if tbl.ndim == 3:
        if axis == 2:
            return pl.BlockSpec((None, block, D), lambda b, h, i, j: (b, i, 0))
        return pl.BlockSpec((None, block, D), lambda b, h, i, j: (b, j, 0))
    if axis == 2:
        return pl.BlockSpec((block, D), lambda b, h, i, j: (i, 0))
    return pl.BlockSpec((block, D), lambda b, h, i, j: (j, 0))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    seg_q_ref,
    seg_kv_ref,
    *refs,
    causal: bool,
    causal_offset: int,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    kv_len: int,
    masked: bool,
    window: int,
    fused_rot: bool,
):
    if fused_rot:
        (cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref,
         q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, qr_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs

    j = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if fused_rot:
            # the q block is fixed across the kv sweep: rotate it once
            qr_scr[:] = _rot_block(q_ref[:, :], cosq_ref[:, :], sinq_ref[:, :], r_ref[:, :])

    q_idx = pl.program_id(2)
    # raw-logit max tracking; the softmax scale (with log2(e) folded in, so
    # the VPU transcendental is a bare exp2) enters only inside the exp2
    # argument as a fused multiply-add — scaling q instead would round the
    # scaled q to bf16 (measured 123x the bf16 noise floor), and scaling s
    # up front costs a standalone [bq, bkv] VPU pass (see _fwd_kernel_single)
    c = sm_scale * LOG2E

    def compute():
        if fused_rot:
            q = qr_scr[:]  # [bq, D], rotated at init
            k = _rot_block(k_ref[:, :], cosk_ref[:, :], sink_ref[:, :], r_ref[:, :])
        else:
            q = q_ref[:, :]  # [bq, D]
            k = k_ref[:, :]  # [bkv, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        if masked:
            sq = seg_q_ref[0, :]  # [bq]
            skv = seg_kv_ref[0, :]  # [bkv]
            valid = (sq[:, None] == skv[None, :]) & (skv[None, :] != 0)
            s = jnp.where(valid, s, NEG_INF)
        if causal or window > 0:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if causal:
                # bottom-right aligned for S != T (matches SDPA and
                # flash-attn >= 2.1): query i sees keys up to i + (T - S)
                s = jnp.where(rows + causal_offset >= cols, s, NEG_INF)
            if window > 0:
                s = jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        # floor keeps p == 0 when an entire block is masked
        # (s == m_new == NEG_INF would otherwise give p == 1)
        m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e20 / c)
        p = jnp.exp2(s * c - m_new * c)  # fma per element
        corr = jnp.exp2((m_prev - m_new) * c)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[:, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = m_new

    live = True
    if causal:
        # skip fully-masked blocks above the diagonal
        live = q_idx * block_q + block_q - 1 + causal_offset >= j * block_kv
    if window > 0:
        # skip blocks entirely outside the band
        w2 = window // 2
        overlap = (j * block_kv <= q_idx * block_q + block_q - 1 + w2) & (
            j * block_kv + block_kv - 1 >= q_idx * block_q - w2
        )
        live = overlap if live is True else (live & overlap)
    if live is True:
        compute()
    else:
        @pl.when(live)
        def _():
            compute()

    @pl.when(j == n_kv - 1)
    def _finalize():
        l = l_scr[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[:, :] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # base-2 LSE (consumed only by the backward kernels); m_scr holds
        # the RAW logit max, scaled into base 2 here
        lse = m_scr[:] * c + jnp.log2(l_safe)
        lse_ref[0, :] = jnp.where(l[:, 0] == 0.0, NEG_INF, lse[:, 0])


def _fwd_kernel_single(
    seg_q_ref,
    seg_kv_ref,
    *refs,
    causal: bool,
    causal_offset: int,
    sm_scale: float,
    block_q: int,
    masked: bool,
    window: int,
    fused_rot: bool,
):
    """Single-pass softmax: the whole kv range fits one block (the common
    bidirectional-encoder case, T <= block_kv), so the online-softmax
    scratch state, correction rescales, and init/finalize VMEM round-trips
    of `_fwd_kernel` all vanish. With the fma scale-fold and ones-column
    rowsum below: fwd 30.7 -> 36.9 TF/s at the S=2048 MLM geometry on
    v5e (the residual cost is the QK matmul shape itself — see ROADMAP #1)."""
    if fused_rot:
        (cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref,
         q_ref, k_ref, v_ref, o_ref, lse_ref) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs

    q_idx = pl.program_id(2)
    if fused_rot:
        k = _rot_block(k_ref[:, :], cosk_ref[:, :], sink_ref[:, :], r_ref[:, :])
    else:
        k = k_ref[:, :]
    v = v_ref[:, :]
    D = v.shape[1]
    # s stays UNSCALED; the softmax scale folds into the exp2 argument as a
    # single fused multiply-add (saves one full [bq, bkv] VPU pass vs
    # scaling s up front)
    c = sm_scale * LOG2E

    # rowsum(p) comes out of the MXU when D leaves lane headroom: V gains a
    # ones column (plus zero padding to the lane width), so l rides along in
    # the PV matmul instead of costing a separate [bq, bkv] VPU reduction.
    # At D % 128 == 0 the lanes are already full — padding would double the
    # PV matmul, so the plain VPU rowsum stays.
    ones_trick = D % 128 != 0
    if ones_trick:
        pad = (-D) % 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], pad), 1)
        ones_col = jnp.where(lane == 0, 1.0, 0.0).astype(v.dtype)
        v_aug = jnp.concatenate([v, ones_col], axis=1)
    else:
        v_aug = v

    if masked:
        skv = seg_kv_ref[0, :]

    def qk(lo, bq):
        qb = q_ref[lo : lo + bq, :]
        if fused_rot:
            qb = _rot_block(qb, cosq_ref[lo : lo + bq, :], sinq_ref[lo : lo + bq, :], r_ref[:, :])
        return jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def finish(s, lo, bq):
        """Mask, softmax, PV, and the output/lse writes for rows [lo, lo+bq)."""
        if masked:
            sq = seg_q_ref[0, lo : lo + bq]
            valid = (sq[:, None] == skv[None, :]) & (skv[None, :] != 0)
            s = jnp.where(valid, s, NEG_INF)
        if causal or window > 0:
            rows = q_idx * block_q + lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if causal:
                # bottom-right aligned for S != T (matches SDPA and
                # flash-attn >= 2.1): query i sees keys up to i + (T - S)
                s = jnp.where(rows + causal_offset >= cols, s, NEG_INF)
            if window > 0:
                s = jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), -1e20 / c)
        p = jnp.exp2(s * c - m * c)  # fma: scaled base-2 logits minus row max
        pb = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            pb, v_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if ones_trick:
            l = pv[:, D : D + 1]
            pv = pv[:, :D]
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[lo : lo + bq, :] = (pv / l_safe).astype(o_ref.dtype)
        lse = m * c + jnp.log2(l_safe)
        lse_ref[0, lo : lo + bq] = jnp.where(l[:, 0] == 0.0, NEG_INF, lse[:, 0])

    # Software pipeline over q sub-blocks: issue sub-block h+1's QK matmul
    # (MXU) before sub-block h's softmax (VPU) so the scheduler can overlap
    # the two units; the serial QK -> softmax -> PV chain otherwise leaves
    # the MXU idle during every softmax pass.
    sub = 256
    # offsets cover ALL of block_q including a trailing remainder sub-block
    # (block_q is a multiple of 128, not necessarily of `sub` — e.g. 384)
    offs = list(range(0, block_q, sub))
    sizes = [min(sub, block_q - lo) for lo in offs]
    if len(offs) == 1:
        finish(qk(0, block_q), 0, block_q)
    else:
        s_prev = qk(offs[0], sizes[0])
        for h in range(1, len(offs)):
            s_next = qk(offs[h], sizes[h])
            finish(s_prev, offs[h - 1], sizes[h - 1])
            s_prev = s_next
        finish(s_prev, offs[-1], sizes[-1])


def _fwd(q, k, v, seg_q, seg_kv, rot, causal, causal_offset, sm_scale, block_q, block_kv, masked, window):
    # q [B, H, S, D]; k/v [B, Hkv, T, D] (GQA: q head h reads kv head h // g)
    # rot: None, or (cos_q, sin_q, cos_k, sin_k, rmat) expanded fp32 tables
    B, H, S, D = q.shape
    T = k.shape[2]
    g = H // k.shape[1]
    grid = (B, H, S // block_q, T // block_kv)
    fused_rot = rot is not None

    q_spec = pl.BlockSpec((None, None, block_q, D), lambda b, h, i, j: (b, h, i, 0))
    kv_spec = pl.BlockSpec((None, None, block_kv, D), lambda b, h, i, j: (b, h // g, j, 0))
    segq_spec = pl.BlockSpec((None, 1, block_q), lambda b, h, i, j: (b, 0, i))
    segkv_spec = pl.BlockSpec((None, 1, block_kv), lambda b, h, i, j: (b, 0, j))

    rot_specs, rot_args = [], []
    if fused_rot:
        cos_q, sin_q, cos_k, sin_k, rmat = rot
        rot_specs = [
            _tbl_spec(cos_q, block_q, 2),
            _tbl_spec(sin_q, block_q, 2),
            _tbl_spec(cos_k, block_kv, 3),
            _tbl_spec(sin_k, block_kv, 3),
            pl.BlockSpec((D, D), lambda b, h, i, j: (0, 0)),
        ]
        rot_args = [cos_q, sin_q, cos_k, sin_k, rmat]

    if T == block_kv:
        kernel = functools.partial(
            _fwd_kernel_single,
            causal=causal,
            causal_offset=causal_offset,
            sm_scale=sm_scale,
            block_q=block_q,
            masked=masked,
            window=window,
            fused_rot=fused_rot,
        )
        scratch = []
    else:
        kernel = functools.partial(
            _fwd_kernel,
            causal=causal,
            causal_offset=causal_offset,
            sm_scale=sm_scale,
            block_q=block_q,
            block_kv=block_kv,
            kv_len=T,
            masked=masked,
            window=window,
            fused_rot=fused_rot,
        )
        scratch = [
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ]
        if fused_rot:
            scratch.append(pltpu.VMEM((block_q, D), q.dtype))  # rotated q
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[segq_spec, segkv_spec, *rot_specs, q_spec, kv_spec, kv_spec],
        out_specs=[
            pl.BlockSpec((None, None, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, S), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(seg_q, seg_kv, *rot_args, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    seg_q_ref, seg_kv_ref, *refs,
    causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot,
):
    if fused_rot:
        (cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, qr_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr) = refs

    j = pl.program_id(3)
    n_kv = pl.num_programs(3)
    q_idx = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        if fused_rot:
            # the q block is fixed across the kv sweep: rotate it once
            qr_scr[:] = _rot_block(q_ref[:, :], cosq_ref[:, :], sinq_ref[:, :], r_ref[:, :])

    def compute():
        if fused_rot:
            q = qr_scr[:]
            k = _rot_block(k_ref[:, :], cosk_ref[:, :], sink_ref[:, :], r_ref[:, :])
        else:
            q = q_ref[:, :]
            k = k_ref[:, :]
        v = v_ref[:, :]
        do = do_ref[:, :].astype(jnp.float32)
        lse = lse_ref[0, :][:, None]
        delta = delta_ref[0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * (sm_scale * LOG2E)  # base-2 logits (see _fwd_kernel note)
        if masked:
            sq = seg_q_ref[0, :]
            skv = seg_kv_ref[0, :]
            valid = (sq[:, None] == skv[None, :]) & (skv[None, :] != 0)
            s = jnp.where(valid, s, NEG_INF)
        if causal or window > 0:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if causal:
                # bottom-right aligned for S != T (matches SDPA and
                # flash-attn >= 2.1): query i sees keys up to i + (T - S)
                s = jnp.where(rows + causal_offset >= cols, s, NEG_INF)
            if window > 0:
                s = jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)
        p = jnp.exp2(s - lse)  # lse stored in base 2 by the forward
        # fully-masked rows store lse == NEG_INF; s is NEG_INF there too, so
        # exp2(s - lse) == 1 everywhere in the row — zero it (their forward
        # output is 0 by contract, so the true gradient is 0)
        p = jnp.where(lse <= NEG_INF / 2, 0.0, p)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    live = True
    if causal:
        live = q_idx * block_q + block_q - 1 + causal_offset >= j * block_kv
    if window > 0:
        w2 = window // 2
        overlap = (j * block_kv <= q_idx * block_q + block_q - 1 + w2) & (
            j * block_kv + block_kv - 1 >= q_idx * block_q - w2
        )
        live = overlap if live is True else (live & overlap)
    if live is True:
        compute()
    else:
        @pl.when(live)
        def _():
            compute()

    @pl.when(j == n_kv - 1)
    def _fin():
        g = dq_scr[:]
        if fused_rot:
            # dq_scr holds the grad wrt ROTATED q; map it back through the
            # rotation's exact adjoint before writing
            g = _rot_adjoint(g, cosq_ref[:, :], sinq_ref[:, :], r_ref[:, :])
        dq_ref[:, :] = g.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    seg_q_ref, seg_kv_ref, *refs,
    causal, causal_offset, sm_scale, block_q, block_kv, masked, n_q, window, fused_rot,
):
    if fused_rot:
        (cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr, kr_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs

    # innermost dim iterates over (q head in GQA group) x (q block):
    # i = qh_in_group * n_q + q_block; dk/dv accumulate across the group
    i = pl.program_id(3)
    n_inner = pl.num_programs(3)
    q_blk = i % n_q
    kv_idx = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)
        if fused_rot:
            # the kv block is fixed across the inner sweep: rotate k once
            kr_scr[:] = _rot_block(k_ref[:, :], cosk_ref[:, :], sink_ref[:, :], r_ref[:, :])

    def compute():
        if fused_rot:
            q = _rot_block(q_ref[:, :], cosq_ref[:, :], sinq_ref[:, :], r_ref[:, :])
            k = kr_scr[:]
        else:
            q = q_ref[:, :]
            k = k_ref[:, :]
        v = v_ref[:, :]
        do = do_ref[:, :].astype(jnp.float32)
        lse = lse_ref[0, :][:, None]
        delta = delta_ref[0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * (sm_scale * LOG2E)  # base-2 logits (see _fwd_kernel note)
        if masked:
            sq = seg_q_ref[0, :]
            skv = seg_kv_ref[0, :]
            valid = (sq[:, None] == skv[None, :]) & (skv[None, :] != 0)
            s = jnp.where(valid, s, NEG_INF)
        if causal or window > 0:
            rows = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = kv_idx * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if causal:
                # bottom-right aligned for S != T (matches SDPA and
                # flash-attn >= 2.1): query i sees keys up to i + (T - S)
                s = jnp.where(rows + causal_offset >= cols, s, NEG_INF)
            if window > 0:
                s = jnp.where(jnp.abs(rows - cols) <= window // 2, s, NEG_INF)
        p = jnp.exp2(s - lse)  # [bq, bkv]
        p = jnp.where(lse <= NEG_INF / 2, 0.0, p)  # fully-masked rows (see dq kernel)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale  # [bq, bkv]
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    live = True
    if causal:
        live = q_blk * block_q + block_q - 1 + causal_offset >= kv_idx * block_kv
    if window > 0:
        w2 = window // 2
        overlap = (kv_idx * block_kv <= q_blk * block_q + block_q - 1 + w2) & (
            kv_idx * block_kv + block_kv - 1 >= q_blk * block_q - w2
        )
        live = overlap if live is True else (live & overlap)
    if live is True:
        compute()
    else:
        @pl.when(live)
        def _():
            compute()

    @pl.when(i == n_inner - 1)
    def _fin():
        g = dk_scr[:]
        if fused_rot:
            # dk_scr holds the grad wrt ROTATED k (see _bwd_dq_kernel note)
            g = _rot_adjoint(g, cosk_ref[:, :], sink_ref[:, :], r_ref[:, :])
        dk_ref[:, :] = g.astype(dk_ref.dtype)
        dv_ref[:, :] = dv_scr[:].astype(dv_ref.dtype)


def _bwd(causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot, res, g):
    q, k, v, seg_q, seg_kv, cos_q, sin_q, cos_k, sin_k, rmat, out, lse = res
    do = g  # [B, H, S, D]
    B, H, S, D = q.shape
    Hkv = k.shape[1]
    T = k.shape[2]
    gq = H // Hkv  # GQA group size

    delta = jnp.sum(
        out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, H, 1, S]

    q_spec = pl.BlockSpec((None, None, block_q, D), lambda b, h, i, j: (b, h, i, 0))
    segq_spec = pl.BlockSpec((None, 1, block_q), lambda b, h, i, j: (b, 0, i))
    segkv_spec = pl.BlockSpec((None, 1, block_kv), lambda b, h, i, j: (b, 0, j))
    kv_spec = pl.BlockSpec((None, None, block_kv, D), lambda b, h, i, j: (b, h // gq, j, 0))
    lse_spec = pl.BlockSpec((None, None, 1, block_q), lambda b, h, i, j: (b, h, 0, i))

    rot_specs, rot_args = [], []
    if fused_rot:
        rot_specs = [
            _tbl_spec(cos_q, block_q, 2),
            _tbl_spec(sin_q, block_q, 2),
            _tbl_spec(cos_k, block_kv, 3),
            _tbl_spec(sin_k, block_kv, 3),
            pl.BlockSpec((D, D), lambda b, h, i, j: (0, 0)),
        ]
        rot_args = [cos_q, sin_q, cos_k, sin_k, rmat]

    dq_scratch = [pltpu.VMEM((block_q, D), jnp.float32)]
    if fused_rot:
        dq_scratch.append(pltpu.VMEM((block_q, D), q.dtype))  # rotated q
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            causal=causal, causal_offset=causal_offset, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, masked=masked, window=window,
            fused_rot=fused_rot,
        ),
        grid=(B, H, S // block_q, T // block_kv),
        in_specs=[segq_spec, segkv_spec, *rot_specs, q_spec, kv_spec, kv_spec, q_spec, lse_spec, lse_spec],
        out_specs=pl.BlockSpec((None, None, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=dq_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(seg_q, seg_kv, *rot_args, q, k, v, do, lse, delta)

    # dk/dv: grid over kv heads; innermost dim sweeps (GQA group member,
    # q block) so the group's contributions accumulate in the scratch
    n_q = S // block_q

    def qh(h, i):
        return h * gq + i // n_q

    segq_i = pl.BlockSpec((None, 1, block_q), lambda b, h, j, i: (b, 0, i % n_q))
    segkv_i = pl.BlockSpec((None, 1, block_kv), lambda b, h, j, i: (b, 0, j))
    q_i = pl.BlockSpec((None, None, block_q, D), lambda b, h, j, i: (b, qh(h, i), i % n_q, 0))
    kv_i = pl.BlockSpec((None, None, block_kv, D), lambda b, h, j, i: (b, h, j, 0))
    lse_i = pl.BlockSpec((None, None, 1, block_q), lambda b, h, j, i: (b, qh(h, i), 0, i % n_q))

    rot_specs_i = []
    if fused_rot:
        # q tables walk the inner (group-member x q-block) axis; k tables
        # walk the kv-block axis (grid here is (b, kv_head, j, i))
        def tbl_i(tbl, block, of_q):
            Dh = tbl.shape[-1]
            if tbl.ndim == 3:
                if of_q:
                    return pl.BlockSpec((None, block, Dh), lambda b, h, j, i: (b, i % n_q, 0))
                return pl.BlockSpec((None, block, Dh), lambda b, h, j, i: (b, j, 0))
            if of_q:
                return pl.BlockSpec((block, Dh), lambda b, h, j, i: (i % n_q, 0))
            return pl.BlockSpec((block, Dh), lambda b, h, j, i: (j, 0))

        rot_specs_i = [
            tbl_i(cos_q, block_q, True),
            tbl_i(sin_q, block_q, True),
            tbl_i(cos_k, block_kv, False),
            tbl_i(sin_k, block_kv, False),
            pl.BlockSpec((D, D), lambda b, h, j, i: (0, 0)),
        ]

    dkv_scratch = [
        pltpu.VMEM((block_kv, D), jnp.float32),
        pltpu.VMEM((block_kv, D), jnp.float32),
    ]
    if fused_rot:
        dkv_scratch.append(pltpu.VMEM((block_kv, D), k.dtype))  # rotated k

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            causal=causal, causal_offset=causal_offset, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, masked=masked, n_q=n_q, window=window,
            fused_rot=fused_rot,
        ),
        grid=(B, Hkv, T // block_kv, gq * n_q),
        in_specs=[segq_i, segkv_i, *rot_specs_i, q_i, kv_i, kv_i, q_i, lse_i, lse_i],
        out_specs=[
            pl.BlockSpec((None, None, block_kv, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((None, None, block_kv, D), lambda b, h, j, i: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, T, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, T, D), v.dtype),
        ],
        scratch_shapes=dkv_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=_use_interpret(),
    )(seg_q, seg_kv, *rot_args, q, k, v, do, lse, delta)

    return dq, dk, dv, None, None, None, None, None, None, None


def _rot_or_none(cos_q, sin_q, cos_k, sin_k, rmat, fused_rot):
    return (cos_q, sin_q, cos_k, sin_k, rmat) if fused_rot else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17))
def _flash(q, k, v, seg_q, seg_kv, cos_q, sin_q, cos_k, sin_k, rmat,
           causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot):
    out, _ = _fwd(q, k, v, seg_q, seg_kv,
                  _rot_or_none(cos_q, sin_q, cos_k, sin_k, rmat, fused_rot),
                  causal, causal_offset, sm_scale, block_q, block_kv, masked, window)
    return out


def _flash_fwd(q, k, v, seg_q, seg_kv, cos_q, sin_q, cos_k, sin_k, rmat,
               causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot):
    out, lse = _fwd(q, k, v, seg_q, seg_kv,
                    _rot_or_none(cos_q, sin_q, cos_k, sin_k, rmat, fused_rot),
                    causal, causal_offset, sm_scale, block_q, block_kv, masked, window)
    return out, (q, k, v, seg_q, seg_kv, cos_q, sin_q, cos_k, sin_k, rmat, out, lse)


def _flash_bwd(causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot, res, g):
    return _bwd(causal, causal_offset, sm_scale, block_q, block_kv, masked, window, fused_rot, res, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_tables(cos, sin, to_len):
    """Pad expanded [.., L, D] tables to L == to_len with identity rows
    (cos=1, sin=0) covering the wrapper's S/T block padding."""
    pad = to_len - cos.shape[-2]
    if pad:
        widths = [(0, 0)] * cos.ndim
        widths[-2] = (0, pad)
        cos = jnp.pad(cos, widths, constant_values=1.0)
        sin = jnp.pad(sin, widths, constant_values=0.0)
    return cos, sin


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    window: int = 0,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 2048,
    rotary_cos: Optional[jnp.ndarray] = None,
    rotary_sin: Optional[jnp.ndarray] = None,
    rotary_interleaved: bool = False,
    rotary_position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Public entry. q [B,S,H,D]; k/v [B,T,Hkv,D]; returns [B,S,H,D].

    Default blocks (512, 2048) are the measured optimum on v5e at S=2048
    (round-2b amortized harness, hw basis: fwd+bwd 63.6 TF/s vs 60 at
    bq=256 or bkv=1024): a wide kv block minimizes online-softmax
    correction passes, and block_kv == full kv degenerates to single-pass
    softmax. At D=64 the kernel is VPU-bound (~5 elementwise passes over
    s per block), so block tuning moves single digits only.

    rotary_cos/rotary_sin ([L, rot_dim/2] fp32 tables, layers/rotary.py
    conventions) enable the FUSED rotary path: q/k are rotated in-VMEM
    inside the kernels instead of paying a q/k HBM round-trip outside.
    rotary_position_ids ([B, S] int) gathers per-row positions (packed
    sequences). Numerically identical to apply_rotary-then-flash."""
    B, S, H, D = q.shape
    T = k.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / (D**0.5)

    fused_rot = rotary_cos is not None
    if fused_rot and S != T:
        # decode-style S != T has ambiguous q positions (and a packed
        # position_ids table only covers the q side); rotate outside
        if rotary_position_ids is not None:
            raise ValueError(
                "rotary_position_ids is a [B, S] q-side table and cannot "
                f"rotate a length-{T} k (S={S} != T); rotate q/k outside "
                "the kernel for cross-attention rotary"
            )
        from contrastors_tpu.layers.rotary import apply_rotary

        q = apply_rotary(q, rotary_cos, rotary_sin, rotary_interleaved)
        k = apply_rotary(k, rotary_cos, rotary_sin, rotary_interleaved)
        fused_rot = False

    if _use_interpret() and not _interpret_enabled():
        from contrastors_tpu.ops.sdpa import sdpa

        if fused_rot:
            from contrastors_tpu.layers.rotary import apply_rotary

            q = apply_rotary(q, rotary_cos, rotary_sin, rotary_interleaved, rotary_position_ids)
            k = apply_rotary(k, rotary_cos, rotary_sin, rotary_interleaved, rotary_position_ids)
        return sdpa(
            q, k, v,
            attention_mask=attention_mask,
            segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids,
            causal=causal,
            window=window,
            softmax_scale=softmax_scale,
        )

    # resolve segments: mask and segment ids merge into int32 ids, 0 = pad
    masked = attention_mask is not None or segment_ids is not None
    if masked:
        if segment_ids is not None:
            seg_q = segment_ids.astype(jnp.int32)
            seg_kv = (kv_segment_ids if kv_segment_ids is not None else segment_ids).astype(jnp.int32)
            if attention_mask is not None:
                seg_kv = seg_kv * attention_mask.astype(jnp.int32)
        else:
            m = attention_mask.astype(jnp.int32)
            seg_kv = m
            seg_q = jnp.ones((B, S), jnp.int32) if S != T else m
    else:
        seg_q = jnp.zeros((B, 0), jnp.int32)
        seg_kv = jnp.zeros((B, 0), jnp.int32)

    bq = min(block_q, _round_up(S, 128))
    bkv = min(block_kv, _round_up(T, 128))
    S_pad = _round_up(S, bq)
    T_pad = _round_up(T, bkv)
    if S_pad != S or T_pad != T:
        if not masked:
            masked = True
            seg_q = jnp.ones((B, S), jnp.int32)
            seg_kv = jnp.ones((B, T), jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, S_pad - S), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
    if masked:
        seg_q = jnp.pad(seg_q, ((0, 0), (0, S_pad - seg_q.shape[1])))
        seg_kv = jnp.pad(seg_kv, ((0, 0), (0, T_pad - seg_kv.shape[1])))
    else:
        seg_q = jnp.zeros((B, S_pad), jnp.int32)
        seg_kv = jnp.zeros((B, T_pad), jnp.int32)

    if fused_rot:
        # expand [L, rot/2] tables to full-D fp32 rows (identity rows over
        # any pass-through tail) and build the signed one-hot rotate matrix
        from contrastors_tpu.layers.rotary import _expand_tables, _rot_matrix

        rot_dim = rotary_cos.shape[-1] * 2
        cos_d, sin_d = _expand_tables(
            rotary_cos, rotary_sin, rotary_cos.shape[0], D, rotary_interleaved
        )
        rmat = jnp.asarray(_rot_matrix(D, rot_dim, rotary_interleaved))  # fp32 [D, D]
        if rotary_position_ids is not None:
            cos_q = jnp.take(cos_d, rotary_position_ids, axis=0)  # [B, S, D]
            sin_q = jnp.take(sin_d, rotary_position_ids, axis=0)
            # the kv-side BlockSpec walks T_pad rows; when S_pad < T_pad
            # (block_kv > block_q at a non-multiple S) the shared table must
            # cover the longer walk or the kernel reads past its end
            cos_q, sin_q = _pad_tables(cos_q, sin_q, max(S_pad, T_pad))
            cos_k, sin_k = cos_q, sin_q
        else:
            cos_q, sin_q = _pad_tables(cos_d[:S], sin_d[:S], S_pad)
            cos_k, sin_k = _pad_tables(cos_d[:T], sin_d[:T], T_pad)
    else:
        zero = jnp.zeros((1, 1), jnp.float32)
        cos_q = sin_q = cos_k = sin_k = rmat = zero

    seg_q = seg_q[:, None, :]
    seg_kv = seg_kv[:, None, :]
    # kernels run in [B, H, S, D]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    causal_offset = (T - S) if causal else 0
    out = _flash(q, k, v, seg_q, seg_kv, cos_q, sin_q, cos_k, sin_k, rmat,
                 causal, causal_offset, softmax_scale, bq, bkv, masked, window, fused_rot)
    return out.transpose(0, 2, 1, 3)[:, :S]
