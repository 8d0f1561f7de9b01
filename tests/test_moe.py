"""MoE: dense->expert checkpoint expansion, trainer integration, and
expert-parallel sharding on the virtual mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import NomicBertModel
from contrastors_tpu.models.moe_interop import expand_dense_trunk_to_moe
from contrastors_tpu.parallel.sharding import param_shardings


def _dense_and_moe_cfg(ffn_div=1, num_experts=4, every_n=2, shared=0):
    base = dict(
        n_embd=32,
        n_layer=4,
        n_head=2,
        n_inner=64,
        vocab_size=128,
        n_positions=32,
        pad_token_id=0,
        activation_function="swiglu",
        type_vocab_size=0,
    )
    dense = TrunkConfig(**base)
    moe = TrunkConfig(
        **base,
        num_experts=num_experts,
        moe_top_k=2,
        moe_every_n_layers=every_n,
        ffn_div=ffn_div,
        num_shared_experts=shared,
    )
    return dense, moe


@pytest.mark.parametrize("ffn_div", [1, 2])
def test_dense_to_moe_expansion_shapes(ffn_div):
    dense_cfg, moe_cfg = _dense_and_moe_cfg(ffn_div=ffn_div)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    dense_model = NomicBertModel(config=dense_cfg)
    dense_params = dense_model.init(jax.random.PRNGKey(0), ids, mask)

    expanded = expand_dense_trunk_to_moe(dense_params["params"], moe_cfg)
    moe_model = NomicBertModel(config=moe_cfg)
    ref = moe_model.init(jax.random.PRNGKey(1), ids, mask)["params"]

    # expanded tree must drop into the MoE model exactly
    flat_a = {jax.tree_util.keystr(p): np.asarray(a).shape for p, a in jax.tree_util.tree_leaves_with_path(expanded)}
    flat_b = {jax.tree_util.keystr(p): np.asarray(a).shape for p, a in jax.tree_util.tree_leaves_with_path(ref)}
    assert flat_a == flat_b

    out = moe_model.apply({"params": expanded}, ids, mask)
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()
    assert len(out["router_logits"]) == 2  # layers 1 and 3 are MoE (i%2==1)


def test_expansion_replicates_dense_weights():
    dense_cfg, moe_cfg = _dense_and_moe_cfg(ffn_div=1, num_experts=4)
    ids = jnp.ones((2, 8), jnp.int32)
    model = NomicBertModel(config=dense_cfg)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
    expanded = expand_dense_trunk_to_moe(params, moe_cfg)
    # ffn_div=1: each expert is an exact copy of the dense MLP
    fc11 = np.asarray(params["layers_1"]["mlp"]["fc11"]["kernel"])  # [D, F]
    w_up = np.asarray(expanded["layers_1"]["mlp"]["w_up"])  # [E, D, F]
    for e in range(4):
        np.testing.assert_array_equal(w_up[e], fc11)


def test_moe_forward_expert_parallel_mesh():
    """Forward with expert tensors sharded over an expert axis of the
    8-device mesh must match the replicated forward."""
    _, moe_cfg = _dense_and_moe_cfg(num_experts=4)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 128, size=(4, 8)))
    mask = jnp.ones_like(ids)
    model = NomicBertModel(config=moe_cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    ref = np.asarray(model.apply(params, ids, mask)["last_hidden_state"])

    devices = np.array(jax.devices()).reshape(2, 4, 1)
    mesh = Mesh(devices, ("data", "expert", "tensor"))
    shardings = param_shardings(params, mesh)
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    # expert tensors actually sharded
    leaf_sh = shardings["params"]["layers_1"]["mlp"]["w_up"]
    assert leaf_sh.spec == P("expert")

    batch_sh = NamedSharding(mesh, P("data"))
    with mesh:
        out = jax.jit(lambda p, i, m: model.apply(p, i, m)["last_hidden_state"])(
            sharded_params, jax.device_put(ids, batch_sh), jax.device_put(mask, batch_sh)
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
