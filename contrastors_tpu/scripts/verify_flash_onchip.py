"""On-chip parity of the reworked fwd kernel vs SDPA: single-pass (T<=2048)
and multi-pass (T=4096) paths, masks, causal, window, GQA, and grads."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastors_tpu.ops.flash_attention import flash_attention
from contrastors_tpu.ops.sdpa import sdpa

rng = np.random.default_rng(0)


def check(name, S, T, H, Hkv, D, causal=False, window=0, mask=False, seg=False):
    B = 2
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.bfloat16)
    kw = {}
    if mask:
        am = np.ones((B, T), np.int32)
        am[:, T - T // 4 :] = 0
        kw["attention_mask"] = jnp.asarray(am)
    if seg:
        sg = np.repeat(np.arange(1, 5), S // 4)[None, :].repeat(B, 0)
        kw["segment_ids"] = jnp.asarray(sg.astype(np.int32))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, causal=causal, window=window, **kw)

    def f_sdpa(q, k, v):
        return sdpa(q, k, v, causal=causal, window=window, **kw)

    o1 = jax.jit(f_flash)(q, k, v)
    o2 = jax.jit(f_sdpa)(q, k, v)
    a1, a2 = np.asarray(o1, np.float32), np.asarray(o2, np.float32)
    if mask and S == T:
        # fully-masked q rows are padding: outputs there are don't-care
        # (flash yields 0, SDPA an arbitrary uniform blend)
        valid = np.asarray(kw["attention_mask"], bool)
        a1, a2 = a1[valid], a2[valid]
    err = np.max(np.abs(a1 - a2))
    # grads (loss over valid q rows only — padding rows are don't-care)
    if mask and S == T:
        w = jnp.asarray(kw["attention_mask"], jnp.float32)[:, :, None, None]
    else:
        w = 1.0

    def loss_flash(q):
        return jnp.sum((f_flash(q, k, v).astype(jnp.float32) * w) ** 2)

    def loss_sdpa(q):
        return jnp.sum((f_sdpa(q, k, v).astype(jnp.float32) * w) ** 2)

    g1 = np.asarray(jax.jit(jax.grad(loss_flash))(q), np.float32)
    g2 = np.asarray(jax.jit(jax.grad(loss_sdpa))(q), np.float32)
    gerr = np.max(np.abs(g1 - g2)) / (np.max(np.abs(g2)) + 1e-9)
    status = "OK" if err < 0.05 and gerr < 0.05 else "FAIL"
    print(f"{name:34s} out-err {err:.4f}  rel-grad-err {gerr:.4f}  {status}")
    assert status == "OK", name


check("bidi S=T=2048 (single-pass)", 2048, 2048, 4, 4, 64)
check("bidi +mask", 2048, 2048, 4, 4, 64, mask=True)
check("bidi +segments (packed)", 2048, 2048, 4, 4, 64, seg=True)
check("causal single-pass", 2048, 2048, 4, 4, 64, causal=True)
check("sliding window 256", 2048, 2048, 4, 4, 64, window=256)
check("GQA 8q/2kv", 1024, 1024, 8, 2, 64, causal=True)
check("D=128 head dim", 1024, 1024, 4, 4, 128)
check("multi-pass T=4096", 4096, 4096, 2, 2, 64, mask=True)
check("cross-attn T!=S", 512, 2048, 4, 4, 64, mask=True)
check("causal cross-attn (bottom-right)", 512, 2048, 4, 4, 64, causal=True)
print("ALL FLASH PARITY OK")
