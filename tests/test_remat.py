"""Gradient checkpointing (nn.remat Block wrappers): grads must equal the
non-remat model exactly (same PRNG keys -> same dropout), with dropout
branches active so the `deterministic` static arg is actually exercised.

Regression: static_argnums previously pointed at the rope arg instead of
`deterministic`, so enabling gradient_checkpointing crashed with
TracerBoolConversionError on every trunk except ParallelBlock decoders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastors_tpu.models.model_config import TrunkConfig


def _grad_check(make_model, params_args, inputs, rngs):
    model_plain = make_model(remat=False)
    model_remat = make_model(remat=True)
    params = model_plain.init(jax.random.PRNGKey(0), *params_args)

    def loss(model):
        def f(p):
            out = model.apply(p, *inputs, deterministic=False, rngs=rngs)
            leaf = out["last_hidden_state"] if isinstance(out, dict) else out
            return jnp.mean(leaf.astype(jnp.float32) ** 2)

        return f

    l0, g0 = jax.value_and_grad(loss(model_plain))(params)
    l1, g1 = jax.value_and_grad(loss(model_remat))(params)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree_util.tree_leaves_with_path(g1)
    ):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(p0))


def test_encoder_remat_with_dropout():
    from contrastors_tpu.models.nomic_bert import NomicBertModel

    cfg = TrunkConfig(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=64, pad_token_id=0,
        n_positions=32, resid_pdrop=0.1, embd_pdrop=0.1, attn_impl="sdpa",
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 60, size=(2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    _grad_check(
        lambda remat: NomicBertModel(config=cfg, remat=remat),
        (ids, mask),
        (ids, mask),
        {"dropout": jax.random.PRNGKey(7)},
    )


@pytest.mark.parametrize("parallel", [False, True])
def test_decoder_remat_with_dropout(parallel):
    from contrastors_tpu.models.decoder import DecoderModel

    cfg = TrunkConfig(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=64, pad_token_id=0,
        n_positions=32, resid_pdrop=0.1, prenorm=True, parallel_block=parallel,
        rotary_emb_fraction=1.0, causal=True, attn_impl="sdpa",
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(5, 60, size=(2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    _grad_check(
        lambda remat: DecoderModel(config=cfg, remat=remat),
        (ids, mask),
        (ids, mask),
        {"dropout": jax.random.PRNGKey(8)},
    )


def test_vit_remat_with_rope_and_dropout():
    """ViT passes a traced rope array into the block — with the old
    static_argnums it would have been marked static (unhashable)."""
    from contrastors_tpu.models.vit import ViTModel

    cfg = TrunkConfig(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=1, pad_token_id=0,
        n_positions=0, img_size=16, patch_size=8, prenorm=True, resid_pdrop=0.1,
        use_pos_embed=False, use_rotary_pos_emb=True, ref_feat_shape=(2, 2),
        attn_impl="sdpa",
    )
    px = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, 16, 16)), jnp.float32)
    _grad_check(
        lambda remat: ViTModel(config=cfg, remat=remat),
        (px,),
        (px,),
        {"dropout": jax.random.PRNGKey(9)},
    )
