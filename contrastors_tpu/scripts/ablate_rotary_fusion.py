"""Ablation (r3 VERDICT next #6): fuse rotary into the Pallas flash kernel?

The claim to test: applying rotary OUTSIDE the kernel (layers/rotary.py MXU
path) costs an extra HBM round-trip of q/k per layer, capping the MLM step;
the reference fuses rotary in CUDA (reference: layers/embedding.py:618-745).
On TPU the counter-argument is arithmetic: the flash kernel is MATMUL-bound
at D=64 (ROADMAP #1), and an in-kernel rotation re-applies the k rotation
once per q block — n_q * T * D^2 extra MXU FLOPs = D/block_q = +12.5% on
the dominant QK matmul, versus the round-trip it saves (2 tensors * ~2
passes of HBM traffic, a fraction of a percent of the step).

Measures, scan-amortized at the MLM geometry (B=8, S=2048, H=12, D=64, bf16):
  A. rotary-outside + flash   (the shipping path), fwd and fwd+bwd
  B. flash alone on pre-rotated inputs (isolates the rotary + round-trip)
  C. prototype FUSED forward kernel (rotation inside, R-matrix matmul per
     block) vs A's forward — parity-checked against A, then timed.

Run: python -m contrastors_tpu.scripts.ablate_rotary_fusion
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contrastors_tpu.layers.rotary import (
    _expand_tables,
    _rot_matrix,
    apply_rotary,
    rotary_cos_sin,
)
from contrastors_tpu.ops.flash_attention import LOG2E, NEG_INF, flash_attention

B, S, H, D = 8, 2048, 12, 64
BLOCK_Q = 512
ITERS = 30


# -- prototype: single-pass forward with in-kernel rotary --------------------
def _fused_fwd_kernel(cosq_ref, sinq_ref, cosk_ref, sink_ref, r_ref,
                      q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q):
    c = sm_scale * LOG2E
    R = r_ref[:, :]

    def rot(x, cos_t, sin_t):
        xr = jax.lax.dot_general(
            x, R, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (x.astype(jnp.float32) * cos_t + xr * sin_t).astype(x.dtype)

    k = rot(k_ref[:, :], cosk_ref[:, :], sink_ref[:, :])
    v = v_ref[:, :]
    sub = 256
    for lo in range(0, block_q, sub):
        q = rot(q_ref[lo : lo + sub, :], cosq_ref[lo : lo + sub, :], sinq_ref[lo : lo + sub, :])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), -1e20 / c)
        p = jnp.exp2(s * c - m * c)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[lo : lo + sub, :] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def fused_flash_fwd(q, k, v, cos_d, sin_d, R):
    # q/k/v [B, H, S, D]; cos_d/sin_d [S, D] expanded fp32 tables
    Bq, Hq, Sq, Dq = q.shape
    T = k.shape[2]
    grid = (Bq, Hq, Sq // BLOCK_Q)
    sm_scale = 1.0 / (Dq**0.5)
    tbl_q = pl.BlockSpec((BLOCK_Q, Dq), lambda b, h, i: (i, 0))
    tbl_k = pl.BlockSpec((T, Dq), lambda b, h, i: (0, 0))
    r_spec = pl.BlockSpec((Dq, Dq), lambda b, h, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, sm_scale=sm_scale, block_q=BLOCK_Q),
        grid=grid,
        in_specs=[
            tbl_q, tbl_q, tbl_k, tbl_k, r_spec,
            pl.BlockSpec((None, None, BLOCK_Q, Dq), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, T, Dq), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, T, Dq), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, BLOCK_Q, Dq), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, Sq, Dq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
    )(cos_d, sin_d, cos_d, sin_d, R, q, k, v)


from contrastors_tpu.scripts.ablate_common import timed


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    cos, sin = rotary_cos_sin(S, D)

    from contrastors_tpu.scripts.ablate_common import scan_amortize

    # A: rotary outside + flash (fwd)
    def a_fwd(q, k, v, carry):
        qr = apply_rotary(q + carry.astype(q.dtype) * 0, cos, sin)
        kr = apply_rotary(k, cos, sin)
        o = flash_attention(qr, kr, v)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    # B: flash alone (inputs pre-rotated once, outside the timed region)
    qr = apply_rotary(q, cos, sin)
    kr = apply_rotary(k, cos, sin)

    def b_fwd(q, k, v, carry):
        o = flash_attention(q + carry.astype(q.dtype) * 0, k, v)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    # C: fused prototype (fwd)
    cos_d, sin_d = _expand_tables(cos, sin, S, D, interleaved=False)
    R = jnp.asarray(_rot_matrix(D, D, interleaved=False), q.dtype)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def c_fwd(qt, kt, vt, carry):
        o = fused_flash_fwd(qt + carry.astype(qt.dtype) * 0, kt, vt, cos_d, sin_d, R)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    # parity: fused == outside-rotary (same bf16 cast points)
    o_ref = np.asarray(
        jax.jit(lambda: flash_attention(qr, kr, v))(), np.float32
    )
    o_fused = np.asarray(
        jax.jit(lambda: fused_flash_fwd(qt, kt, vt, cos_d, sin_d, R))(), np.float32
    ).transpose(0, 2, 1, 3)
    err = np.abs(o_fused - o_ref).max()
    print(f"fused-vs-outside parity: max |d| = {err:.5f}")
    assert err < 0.02, "fused kernel diverges from the shipping path"

    flops_attn = 4 * B * H * S * S * D  # qk + pv, fwd
    t_a = timed(scan_amortize(a_fwd, n=ITERS), q, k, v) / ITERS
    t_b = timed(scan_amortize(b_fwd, n=ITERS), qr, kr, v) / ITERS
    t_c = timed(scan_amortize(c_fwd, n=ITERS), qt, kt, vt) / ITERS
    print(f"A rotary-outside + flash fwd : {t_a*1e3:8.3f} ms  {flops_attn/t_a/1e12:6.1f} TF/s")
    print(f"B flash fwd alone            : {t_b*1e3:8.3f} ms  {flops_attn/t_b/1e12:6.1f} TF/s")
    print(f"C FUSED rotary flash fwd     : {t_c*1e3:8.3f} ms  {flops_attn/t_c/1e12:6.1f} TF/s")
    print(f"rotary-outside overhead (A-B): {(t_a-t_b)*1e3:8.3f} ms ({(t_a-t_b)/t_a*100:.1f}% of A)")
    print(f"fusion delta (C-A)           : {(t_c-t_a)*1e3:8.3f} ms ({(t_c-t_a)/t_a*100:+.1f}%)")

    # fwd+bwd on the shipping path, rotary outside vs pre-rotated
    def a_fb(q, k, v, carry):
        def loss(q, k):
            qr = apply_rotary(q, cos, sin)
            kr = apply_rotary(k, cos, sin)
            return flash_attention(qr, kr, v).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1))(q + carry.astype(q.dtype) * 0, k)
        return carry + g[0].astype(jnp.float32).sum() * 0 + 1

    def b_fb(q, k, v, carry):
        def loss(q, k):
            return flash_attention(q, k, v).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1))(q + carry.astype(q.dtype) * 0, k)
        return carry + g[0].astype(jnp.float32).sum() * 0 + 1

    t_afb = timed(scan_amortize(a_fb, n=ITERS), q, k, v) / ITERS
    t_bfb = timed(scan_amortize(b_fb, n=ITERS), qr, kr, v) / ITERS
    print(f"A rotary-outside fwd+bwd     : {t_afb*1e3:8.3f} ms")
    print(f"B flash fwd+bwd alone        : {t_bfb*1e3:8.3f} ms")
    print(f"rotary fwd+bwd overhead      : {(t_afb-t_bfb)*1e3:8.3f} ms ({(t_afb-t_bfb)/t_afb*100:.1f}% of A)")


if __name__ == "__main__":
    main()
