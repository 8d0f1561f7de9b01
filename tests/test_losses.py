"""Loss math: hand-computed NLL parity (reference tests/test_loss.py:5-17)
plus sharded == global equivalence on a virtual 8-device mesh — the test the
CUDA reference could never run without 2 GPUs (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from contrastors_tpu.losses import clip_loss, clip_loss_symmetric, matryoshka_clip_loss, router_aux_loss


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def manual_infonce(q, d, scale=1.0, mult=1):
    logits = scale * (q @ d.T)
    labels = np.arange(q.shape[0]) * mult
    logz = np.log(np.exp(logits).sum(-1))
    return float(np.mean(logz - logits[np.arange(len(labels)), labels]))


def test_clip_loss_matches_manual():
    rng = np.random.default_rng(0)
    q = _norm(rng.normal(size=(8, 16))).astype(np.float32)
    d = _norm(rng.normal(size=(8, 16))).astype(np.float32)
    loss, acc = clip_loss(jnp.asarray(q), jnp.asarray(d), lambda x: x * 20.0)
    np.testing.assert_allclose(float(loss), manual_infonce(q, d, 20.0), rtol=1e-5)
    assert 0.0 <= float(acc) <= 1.0


def test_clip_loss_with_negatives():
    rng = np.random.default_rng(1)
    q = _norm(rng.normal(size=(4, 16))).astype(np.float32)
    d = _norm(rng.normal(size=(16, 16))).astype(np.float32)  # 1 pos + 3 negs each
    loss, _ = clip_loss(jnp.asarray(q), jnp.asarray(d), lambda x: x)
    np.testing.assert_allclose(float(loss), manual_infonce(q, d, 1.0, mult=4), rtol=1e-5)


def test_sharded_clip_loss_equals_global():
    devices = jax.devices()
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devices), ("data",))

    rng = np.random.default_rng(2)
    q = _norm(rng.normal(size=(32, 16))).astype(np.float32)
    d = _norm(rng.normal(size=(32, 16))).astype(np.float32)

    global_loss, _ = clip_loss(jnp.asarray(q), jnp.asarray(d), lambda x: x * 10.0)

    def shard_fn(qs, ds):
        loss, _ = clip_loss(qs, ds, lambda x: x * 10.0, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(
        shard_fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
    )(jnp.asarray(q), jnp.asarray(d))
    np.testing.assert_allclose(float(sharded), float(global_loss), rtol=1e-5)


def test_sharded_clip_loss_gradients_equal_global():
    """Gradient of the sharded loss wrt embeddings == global gradient — the
    guarantee the reference anchors with a 2-GPU torchrun script
    (reference test_grad_cache.py)."""
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(3)
    q = _norm(rng.normal(size=(16, 8))).astype(np.float32)
    d = _norm(rng.normal(size=(16, 8))).astype(np.float32)

    def gl(qq, dd):
        return clip_loss(qq, dd, lambda x: x * 5.0)[0]

    g_global = jax.grad(gl, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(d))

    def sh(qq, dd):
        def inner(qs, ds):
            loss, _ = clip_loss(qs, ds, lambda x: x * 5.0, axis_name="data")
            return jax.lax.pmean(loss, "data")

        return shard_map(inner, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())(qq, dd)

    g_sharded = jax.grad(sh, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(d))
    for a, b in zip(g_global, g_sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_symmetric_clip_sharded_equals_global():
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",))
    rng = np.random.default_rng(4)
    im = _norm(rng.normal(size=(16, 8))).astype(np.float32)
    tx = _norm(rng.normal(size=(16, 8))).astype(np.float32)

    g = clip_loss_symmetric(jnp.asarray(im), jnp.asarray(tx), lambda x: x * 7.0)

    def inner(a, b):
        return jax.lax.pmean(
            clip_loss_symmetric(a, b, lambda x: x * 7.0, axis_name="data"), "data"
        )

    s = shard_map(inner, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())(
        jnp.asarray(im), jnp.asarray(tx)
    )
    np.testing.assert_allclose(float(s), float(g), rtol=1e-5)


def test_matryoshka_loss_runs():
    rng = np.random.default_rng(5)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    d = rng.normal(size=(8, 32)).astype(np.float32)
    loss, acc = matryoshka_clip_loss(
        jnp.asarray(q), jnp.asarray(d), lambda x: x * 10.0, dims=[8, 16, 32]
    )
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0
    # full-dim slice must equal plain clip loss on normalized inputs, and
    # the reported accuracy must be the full-dim in-batch accuracy
    full, full_acc = matryoshka_clip_loss(jnp.asarray(q), jnp.asarray(d), lambda x: x * 10.0, dims=[32])
    ref, ref_acc = clip_loss(jnp.asarray(_norm(q)), jnp.asarray(_norm(d)), lambda x: x * 10.0)
    np.testing.assert_allclose(float(full), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(full_acc), float(ref_acc), rtol=1e-6)


def test_router_aux_loss_balanced_is_one():
    """Uniform router probs with top_k=1 give exactly 1.0 — the Switch
    normalization by num_experts (reference loss.py:56,73: sum over [k,E] of
    tokens_per_expert * router_prob, times num_experts)."""
    E, N = 4, 64
    logits = [jnp.zeros((N, E), dtype=jnp.float32)]
    loss = router_aux_loss(logits, num_experts=E, top_k=1)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)
    # top_k=k scales the balanced value to k
    loss2 = router_aux_loss(logits, num_experts=E, top_k=2)
    np.testing.assert_allclose(float(loss2), 2.0, rtol=1e-6)


def test_router_aux_loss_mask():
    rng = np.random.default_rng(6)
    E = 4
    logits = [jnp.asarray(rng.normal(size=(12, E)).astype(np.float32))]
    mask = jnp.asarray((rng.random((3, 4)) > 0.3).astype(np.int32))
    loss = router_aux_loss(logits, num_experts=E, top_k=2, attention_mask=mask)
    assert np.isfinite(float(loss)) and float(loss) > 0
