"""Tensor-parallel sharding rules (beyond-reference — the CUDA stack is
DDP-only, SURVEY §2.10): Megatron-style column/row param splits over the
"tensor" mesh axis must leave forward outputs and gradients identical to
the replicated run; GSPMD inserts the all-reduces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contrastors_tpu.models.biencoder import BiEncoder
from contrastors_tpu.models.presets import nomic_bert_2048
from contrastors_tpu.parallel.sharding import param_shardings
from contrastors_tpu.losses import clip_loss


def make_mesh(data, tensor, expert=1):
    devs = np.array(jax.devices()[: data * tensor * expert]).reshape(data, expert, tensor)
    return Mesh(devs, ("data", "expert", "tensor"))


def test_tp_param_specs():
    cfg = nomic_bert_2048(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_inner=128, attn_impl="sdpa"
    )
    model = BiEncoder(config=cfg, pooling="mean", dtype=jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids, attention_mask=jnp.ones_like(ids))
    mesh = make_mesh(2, 4)
    sh = param_shardings(params, mesh)
    trunk = sh["params"]["trunk"]["layers_0"]
    assert trunk["attn"]["Wqkv"]["kernel"].spec == P(None, "tensor")
    assert trunk["attn"]["out_proj"]["kernel"].spec == P("tensor", None)
    assert trunk["mlp"]["fc11"]["kernel"].spec == P(None, "tensor")
    assert trunk["mlp"]["fc2"]["kernel"].spec == P("tensor", None)
    # embeddings / norms replicated
    assert sh["params"]["trunk"]["emb_ln"]["weight"].spec == P()
    assert sh["params"]["trunk"]["embeddings"]["word_embeddings"]["embedding"].spec == P()


def test_tp_forward_and_grads_match_replicated():
    cfg = nomic_bert_2048(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_inner=128, attn_impl="sdpa"
    )
    model = BiEncoder(config=cfg, pooling="mean", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 8, 16
    q_ids = jnp.asarray(rng.integers(5, 250, size=(B, S)), jnp.int32)
    d_ids = jnp.asarray(rng.integers(5, 250, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), input_ids=q_ids, attention_mask=mask)

    def loss(p, qi, di):
        q = model.apply(p, input_ids=qi, attention_mask=mask)["embedding"]
        d = model.apply(p, input_ids=di, attention_mask=mask)["embedding"]
        return clip_loss(q, d, lambda x: x * 20.0)[0]

    grad_fn = jax.jit(jax.value_and_grad(loss))

    # replicated reference (single device)
    ref_loss, ref_grads = grad_fn(params, q_ids, d_ids)

    # dp=2 x tp=4 sharded run
    mesh = make_mesh(2, 4)
    sh = param_shardings(params, mesh)
    n_tp = sum(
        1 for s in jax.tree_util.tree_leaves(sh) if "tensor" in str(s.spec)
    )
    assert n_tp >= 4 * cfg.n_layer  # Wqkv/out_proj/fc11/fc12/fc2 per layer

    params_s = jax.tree_util.tree_map(jax.device_put, params, sh)
    dp = NamedSharding(mesh, P("data"))
    with mesh:
        tp_loss, tp_grads = grad_fn(
            jax.device_put(params_s, sh), jax.device_put(q_ids, dp), jax.device_put(d_ids, dp)
        )
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tp_grads), jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_tp_with_expert_axis_moe():
    """tensor + expert axes compose on MoE expert tensors [E, in, out]."""
    from contrastors_tpu.models.model_config import TrunkConfig
    from contrastors_tpu.models.nomic_bert import NomicBertModel

    cfg = TrunkConfig(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=64, pad_token_id=0,
        n_positions=32, activation_function="swiglu", num_experts=4, moe_top_k=2,
        moe_every_n_layers=2, attn_impl="sdpa",
    )
    model = NomicBertModel(config=cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(5, 60, size=(8, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(3), ids, mask)

    mesh = make_mesh(2, 2, expert=2)
    sh = param_shardings(params, mesh)
    moe_layer = sh["params"]["layers_1"]["mlp"]
    assert moe_layer["w_up"].spec == P("expert", None, "tensor")
    assert moe_layer["w_down"].spec == P("expert", "tensor", None)

    params_s = jax.tree_util.tree_map(jax.device_put, params, sh)

    @jax.jit
    def loss(p, i, m):
        return jnp.mean(model.apply(p, i, m)["last_hidden_state"] ** 2)

    ref = float(loss(params, ids, mask))
    dp = NamedSharding(mesh, P("data"))
    with mesh:
        got = float(loss(params_s, jax.device_put(ids, dp), jax.device_put(mask, dp)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_tp_trainer_e2e(tmp_path):
    """parallel_args.tensor > 1 trains end-to-end from YAML-style config
    (params placed by the trainer via param_shardings)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_trainer_e2e import base_config, make_checkpoint_dir, make_pairs_file, read_metrics
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    ckpt = make_checkpoint_dir(tmp_path)
    data = make_pairs_file(tmp_path, n=64)
    out = str(tmp_path / "run_tp")
    cfg = base_config(ckpt, data, out, num_epochs=2)
    cfg.parallel_args.tensor = 2
    cfg.parallel_args.data = 4
    trainer = TRAINER_REGISTRY["encoder"](cfg, "fp32")
    # TP placement actually applied
    specs = [str(l.sharding.spec) for l in jax.tree_util.tree_leaves(trainer.params) if hasattr(l, "sharding")]
    assert any("tensor" in s for s in specs)
    trainer.train()
    metrics = read_metrics(out)
    losses = [m["loss"] for m in metrics if "loss" in m]
    assert all(np.isfinite(l) for l in losses)
    assert losses[0] > 0.2, f"degenerate init loss: {losses}"
    assert losses[-1] < 0.5 * losses[0], f"loss did not converge: {losses}"
