"""Chunked-remat GradCache gradients == naive full-batch gradients.

The deterministic version of the reference's 2-GPU parity harness
(reference: test_grad_cache.py:63-119) — single device and on an 8-device
mesh, no hardware needed.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from contrastors_tpu.grad_cache import grad_cache_loss_and_grads
from contrastors_tpu.losses import clip_loss
from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import NomicBertModel
from contrastors_tpu.models.biencoder import mean_pool


def _setup():
    cfg = TrunkConfig(
        n_embd=32,
        n_layer=2,
        n_head=2,
        n_inner=64,
        vocab_size=128,
        n_positions=32,
        type_vocab_size=0,
        pad_token_id=0,
    )
    model = NomicBertModel(config=cfg, add_pooling_layer=False)
    rng = np.random.default_rng(0)
    B, S = 16, 12
    ids = jnp.asarray(rng.integers(5, 128, size=(B, S)))
    mask = jnp.ones((B, S), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:2], mask[:2])

    def encode(p, batch, rng_key):
        out = model.apply(p, batch["input_ids"], batch["attention_mask"])
        emb = mean_pool(out["last_hidden_state"], batch["attention_mask"])
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return {"embedding": emb}

    batch = {"input_ids": ids, "attention_mask": mask}
    return model, params, encode, batch


def test_grad_cache_matches_naive():
    model, params, encode, batch = _setup()

    def loss_fn(q, d):
        return clip_loss(q, d, lambda x: x * 10.0)[0]

    def naive(p):
        q = encode(p, batch, None)["embedding"]
        d = encode(p, batch, None)["embedding"]
        return loss_fn(q, d)

    naive_loss, naive_grads = jax.value_and_grad(naive)(params)

    gc_loss, gc_grads = jax.jit(
        lambda p: grad_cache_loss_and_grads(
            p, batch, batch, encode, encode, loss_fn, chunk_size=4
        )
    )(params)

    np.testing.assert_allclose(float(gc_loss), float(naive_loss), rtol=1e-5)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(naive_grads),
        jax.tree_util.tree_leaves_with_path(gc_grads),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(p1))


def test_grad_cache_hybrid_direct_matches_naive():
    """Hybrid mode (leading chunks via live-activation vjp, rest cached)
    stays exactly equal to the naive full-batch gradients for every split,
    including all-direct and asymmetric q/d splits."""
    model, params, encode, batch = _setup()

    def loss_fn(q, d):
        return clip_loss(q, d, lambda x: x * 10.0)[0]

    def naive(p):
        q = encode(p, batch, None)["embedding"]
        d = encode(p, batch, None)["embedding"]
        return loss_fn(q, d)

    naive_loss, naive_grads = jax.value_and_grad(naive)(params)

    # -1 = "all chunks direct" (the bench CLI convention, normalized in
    # the engine — round-4 review #5)
    for kq, kd in ((1, 1), (4, 4), (2, 0), (0, 3), (-1, -1)):
        gc_loss, gc_grads = jax.jit(
            lambda p, kq=kq, kd=kd: grad_cache_loss_and_grads(
                p, batch, batch, encode, encode, loss_fn, chunk_size=4,
                direct_chunks=kq, direct_chunks_d=kd,
            )
        )(params)
        np.testing.assert_allclose(float(gc_loss), float(naive_loss), rtol=1e-5)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(naive_grads),
            jax.tree_util.tree_leaves_with_path(gc_grads),
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"direct=({kq},{kd}) {p1}",
            )


def test_grad_cache_direct_with_router_aux_matches_cached():
    """Direct chunks compose with the MoE router aux (round 5): the direct
    forward runs PER-CHUNK (vmap) when router_aux_coef != 0, preserving the
    reference's per-chunk aux accounting exactly — sum of per-chunk values,
    loss.py:158-160. The fully-cached mode is the ground truth; the aux is
    a deliberately NONLINEAR per-chunk statistic so a flat-batch aux (the
    aux-free direct formulation) would NOT match."""
    model, params, encode, batch = _setup()
    coef = 0.05

    def aux_encode(p, b, rng_key):
        out = encode(p, b, rng_key)
        emb = out["embedding"]
        # mean-of-squares over the chunk: sum_k aux_k != aux(flat batch)
        out["router_aux"] = jnp.mean(jnp.square(jnp.sum(emb, axis=0)))
        return out

    def loss_fn(q, d):
        return clip_loss(q, d, lambda x: x * 10.0)[0]

    ref_loss, ref_grads = jax.jit(
        lambda p: grad_cache_loss_and_grads(
            p, batch, batch, aux_encode, aux_encode, loss_fn, chunk_size=4,
            router_aux_coef=coef,
        )
    )(params)
    assert np.isfinite(float(ref_loss))

    for kq, kd in ((1, 0), (2, 2), (-1, -1)):
        gc_loss, gc_grads = jax.jit(
            lambda p, kq=kq, kd=kd: grad_cache_loss_and_grads(
                p, batch, batch, aux_encode, aux_encode, loss_fn, chunk_size=4,
                direct_chunks=kq, direct_chunks_d=kd, router_aux_coef=coef,
            )
        )(params)
        np.testing.assert_allclose(
            float(gc_loss), float(ref_loss), rtol=1e-5,
            err_msg=f"direct=({kq},{kd})",
        )
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves_with_path(gc_grads),
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"direct=({kq},{kd}) {p1}",
            )


def test_grad_cache_embed_parallel_exact():
    """Pass-1 super-chunking (embed_parallel: m chunks vmapped per launch,
    one fold_in key per sub-chunk) leaves loss and grads identical to the
    m=1 baseline — including for a STOCHASTIC encoder, because each
    sub-chunk keeps the exact key pass 2 replays."""
    model, params, encode, batch = _setup()

    def stochastic_encode(p, b, rng_key):
        out = encode(p, b, rng_key)
        # rng-dependent multiplicative noise: any pass-1/pass-2 key
        # mismatch (the dropout-replay hazard) breaks grad parity loudly
        noise = 1.0 + 0.3 * jax.random.normal(rng_key, out["embedding"].shape)
        emb = out["embedding"] * noise
        return {"embedding": emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)}

    def loss_fn(q, d):
        return clip_loss(q, d, lambda x: x * 10.0)[0]

    base = None
    for enc in (encode, stochastic_encode):
        for m, md in ((1, 1), (2, 2), (4, 1), (3, 2), (16, 16)):
            loss, grads = jax.jit(
                lambda p, m=m, md=md, enc=enc: grad_cache_loss_and_grads(
                    p, batch, batch, enc, enc, loss_fn, chunk_size=4,
                    rng=jax.random.PRNGKey(11),
                    embed_parallel=m, embed_parallel_d=md,
                )
            )(params)
            if m == 1 and md == 1:
                base = (float(loss), grads)
                continue
            np.testing.assert_allclose(float(loss), base[0], rtol=1e-6)
            for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(base[1]),
                jax.tree_util.tree_leaves_with_path(grads),
            ):
                assert p1 == p2
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"embed_parallel=({m},{md}) {enc.__name__} {p1}",
                )
        base = None


def test_grad_cache_sharded_matches_global_naive():
    """GradCache under shard_map over 8 devices (embeddings gathered in the
    loss) == single-device full-batch gradients."""
    model, params, encode, batch = _setup()
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def global_loss_fn(q, d):
        return clip_loss(q, d, lambda x: x * 10.0)[0]

    def naive(p):
        q = encode(p, batch, None)["embedding"]
        d = encode(p, batch, None)["embedding"]
        return global_loss_fn(q, d)

    naive_loss, naive_grads = jax.value_and_grad(naive)(params)

    def sharded_loss_fn(q, d):
        # Local rows vs gathered docs, scaled by 1/world so that the
        # device-sum (which jax.grad wrt replicated params produces
        # automatically under shard_map) equals the global mean loss.
        loss, _ = clip_loss(q, d, lambda x: x * 10.0, axis_name="data")
        return loss / jax.lax.axis_size("data")

    def step(p, b):
        loss, grads = grad_cache_loss_and_grads(
            p, b, b, encode, encode, sharded_loss_fn, chunk_size=1
        )
        # grads are already cross-device sums (replicated-param transpose
        # inserts the psum); only the reported loss needs the psum.
        return jax.lax.psum(loss, "data"), grads

    loss, grads = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), {"input_ids": P("data"), "attention_mask": P("data")}),
            out_specs=(P(), P()),
        )
    )(params, batch)

    np.testing.assert_allclose(float(loss), float(naive_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(naive_grads), jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
