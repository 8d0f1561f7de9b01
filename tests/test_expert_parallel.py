"""Expert-parallel MoE (round-2 VERDICT next #5): the capacity dispatch is
the EP path of record — its einsums shard over the "expert" axis with NO
all-gather of expert weights (HLO-verified), while the dropless ragged
layout is unpartitionable by GSPMD (HLO shows the weight gather — the
documented reason moe_impl="auto" resolves to capacity under EP)."""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import NomicBertModel
from contrastors_tpu.parallel.sharding import param_shardings

E, D, F = 4, 32, 64  # w_up global [4, 32, 64]; per-device [1, 32, 64] at ep=4


def _moe_cfg(**over):
    base = dict(
        n_embd=D, n_layer=2, n_head=2, n_inner=F, vocab_size=128,
        pad_token_id=0, n_positions=32, activation_function="swiglu",
        num_experts=E, moe_top_k=2, moe_every_n_layers=2, attn_impl="sdpa",
        type_vocab_size=0,
    )
    base.update(over)
    return TrunkConfig(**base)


def _ep_step(moe_impl):
    """(loss8, ref_loss, hlo) for a fwd+bwd MoE step on a 2x4 dp x ep mesh."""
    cfg = _moe_cfg(moe_impl=moe_impl)
    model = NomicBertModel(config=cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 120, size=(8, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    def loss_fn(p, i, m):
        h = model.apply(p, i, m)["last_hidden_state"]
        return jnp.mean(jnp.square(h))

    ref = float(jax.jit(jax.value_and_grad(loss_fn))(params, ids, mask)[0])

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4, 1), ("data", "expert", "tensor"))
    shardings = param_shardings(params, mesh)
    assert shardings["params"]["layers_1"]["mlp"]["w_up"].spec == P("expert")
    p8 = jax.tree_util.tree_map(jax.device_put, params, shardings)
    bsh = NamedSharding(mesh, P("data"))
    i8, m8 = jax.device_put(ids, bsh), jax.device_put(mask, bsh)

    step = jax.jit(jax.value_and_grad(loss_fn))
    with mesh:
        lowered = step.lower(p8, i8, m8).compile()
        loss8 = float(step(p8, i8, m8)[0])
    return loss8, ref, lowered.as_text()


def _weight_allgathers(hlo):
    """all-gather lines whose result is a full [E, D, F]-shaped expert
    weight (any dtype) — the collective the EP path must not emit."""
    return [
        line
        for line in hlo.splitlines()
        if "all-gather" in line and re.search(rf"\[{E},{D},{F}\]|\[{E},{F},{D}\]", line)
    ]


def test_capacity_ep_no_weight_allgather():
    loss8, ref, hlo = _ep_step("capacity")
    np.testing.assert_allclose(loss8, ref, rtol=1e-5, atol=1e-6)
    gathers = _weight_allgathers(hlo)
    assert not gathers, f"capacity EP all-gathered expert weights: {gathers[:2]}"
    # the sharded weight actually appears at its per-device shape somewhere
    assert re.search(rf"\[1,{D},{F}\]", hlo), "per-device expert weight shard not found"


def test_dropless_ep_correct_but_collective_heavy():
    """Dropless under EP is numerically correct but the data-dependent
    ragged layout partitions badly: measured here (ragged_dot lowering,
    8-dev CPU mesh) it emits ~2x the collectives of the capacity dispatch
    (31 vs 17 at this geometry), with 3x the all-gathers — and on real TPU
    the Pallas gmm is a custom call GSPMD cannot partition at all, so its
    operands get fully replicated. This pins the rationale for
    moe_impl="auto" resolving to capacity under EP; if a future XLA closes
    the gap, revisit the default."""
    loss8, ref, hlo_d = _ep_step("dropless")
    np.testing.assert_allclose(loss8, ref, rtol=1e-5, atol=1e-6)
    _, _, hlo_c = _ep_step("capacity")

    def n_collectives(hlo):
        ops = ("all-gather(", "all-to-all(", "collective-permute(", "all-reduce(")
        return sum(1 for l in hlo.splitlines() if any(f" {op}" in l for op in ops))

    assert n_collectives(hlo_d) > n_collectives(hlo_c), (
        f"dropless EP now partitions as well as capacity "
        f"({n_collectives(hlo_d)} vs {n_collectives(hlo_c)} collectives) — "
        f"revisit the auto default"
    )


def test_moe_impl_auto_resolution(tmp_path):
    """moe_impl='auto' (config default) resolves per-mesh in the trainer:
    capacity when the expert axis is real, dropless on a single host."""
    from test_trainer_e2e import base_config, make_checkpoint_dir, make_pairs_file
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    ckpt = make_checkpoint_dir(tmp_path)
    data = make_pairs_file(tmp_path, n=32)

    def build(expert_axis, name):
        cfg = base_config(ckpt, data, str(tmp_path / name), num_epochs=1)
        cfg.model_args.num_experts = 4
        cfg.model_args.moe_top_k = 2
        cfg.model_args.moe_every_n_layers = 2
        assert cfg.model_args.moe_impl == "auto"
        if expert_axis > 1:
            cfg.parallel_args.data = 8 // expert_axis
            cfg.parallel_args.expert = expert_axis
        return TRAINER_REGISTRY["encoder"](cfg, "fp32")

    tr_ep = build(2, "ep")
    assert tr_ep.config.model_args.moe_impl == "capacity"
    assert tr_ep.biencoder.config.moe_impl == "capacity"

    tr_single = build(1, "single")
    assert tr_single.config.model_args.moe_impl == "dropless"
    assert tr_single.biencoder.config.moe_impl == "dropless"


def test_moe_impl_unresolved_raises():
    """'auto' (or a typo) reaching the layer unresolved fails loudly — a
    dropless-trained checkpoint silently evaluated with the token-dropping
    capacity dispatch is the failure this guards (code-review r3 #2)."""
    import jax

    cfg = _moe_cfg(moe_impl="auto")
    model = NomicBertModel(config=cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="moe_impl"):
        model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))


def test_moe_impl_auto_resolves_outside_trainer(tmp_path):
    """load_biencoder outside a trainer (encode/eval scripts) resolves
    'auto' to dropless instead of leaking it into the layer."""
    from test_trainer_e2e import make_checkpoint_dir
    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.models.auto import load_biencoder

    ckpt = make_checkpoint_dir(tmp_path)
    margs = ModelArgs(
        model_type="encoder", model_name=ckpt, pooling="mean",
        num_experts=4, moe_top_k=2, moe_every_n_layers=2, attn_impl="sdpa",
    )
    assert margs.moe_impl == "auto"
    module, params, cfg = load_biencoder(margs)
    assert cfg.moe_impl == "dropless"
