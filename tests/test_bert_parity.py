"""Numerical parity of the flax NomicBERT vs HuggingFace torch BERT/XLM-R.

Mirrors the reference test strategy (reference tests/test_flash_bert.py:36-82)
but with randomly-initialized HF models as the fp32 gold (no network):
remap HF weights -> flax, random inputs with random per-sequence lengths,
compare valid positions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
from transformers import BertConfig, BertForMaskedLM, BertModel, XLMRobertaConfig, XLMRobertaModel

from contrastors_tpu.models.hf_interop import (
    bert_config_to_trunk_config,
    bert_state_dict_to_flax,
    flax_to_bert_state_dict,
    torch_state_dict_to_numpy,
)
from contrastors_tpu.models.nomic_bert import NomicBertForPreTraining, NomicBertModel

SMALL = dict(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    type_vocab_size=2,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def random_batch(rng, batch=3, seqlen=17, vocab=128, pad_token_id=0):
    input_ids = rng.integers(5, vocab, size=(batch, seqlen))
    lengths = rng.integers(4, seqlen + 1, size=(batch,))
    mask = (np.arange(seqlen)[None, :] < lengths[:, None]).astype(np.int64)
    input_ids = np.where(mask, input_ids, pad_token_id)
    return input_ids, mask


def masked_max_err(a, b, mask):
    d = np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))
    return float((d * mask[:, :, None]).max())


@pytest.mark.parametrize("seqlen", [16, 33])
def test_bert_trunk_parity(seqlen):
    torch.manual_seed(0)
    hf = BertModel(BertConfig(**SMALL)).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    rng = np.random.default_rng(0)
    input_ids, mask = random_batch(rng, seqlen=seqlen)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    model = NomicBertModel(config=cfg, add_pooling_layer=False)
    out = model.apply(params, jnp.asarray(input_ids), jnp.asarray(mask))["last_hidden_state"]

    err = masked_max_err(out, ref, mask)
    assert err < 2e-5, f"max |flax - torch| = {err}"


def test_bert_trunk_parity_bf16_noise_floor():
    """Reference criterion (test_flash_bert.py:77-82): low-precision model
    error < 3x the dtype-cast noise floor of the torch reference."""
    torch.manual_seed(0)
    hf = BertModel(BertConfig(**SMALL)).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    rng = np.random.default_rng(1)
    input_ids, mask = random_batch(rng)

    with torch.no_grad():
        gold = hf(torch.tensor(input_ids), attention_mask=torch.tensor(mask)).last_hidden_state
        hf_bf16 = hf.to(torch.bfloat16)
        noise = hf_bf16(torch.tensor(input_ids), attention_mask=torch.tensor(mask)).last_hidden_state

    noise_floor = masked_max_err(noise.float().numpy(), gold.numpy(), mask)

    model = NomicBertModel(config=cfg, add_pooling_layer=False, dtype=jnp.bfloat16)
    out = model.apply(params, jnp.asarray(input_ids), jnp.asarray(mask))["last_hidden_state"]
    err = masked_max_err(np.asarray(out, dtype=np.float32), gold.numpy(), mask)
    assert err < 3 * noise_floor, f"bf16 err {err} vs noise floor {noise_floor}"


def test_mlm_head_parity():
    torch.manual_seed(0)
    hf = BertForMaskedLM(BertConfig(**SMALL)).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(
        torch_state_dict_to_numpy(hf.state_dict()), cfg, head="pretraining"
    )

    rng = np.random.default_rng(2)
    input_ids, mask = random_batch(rng)
    with torch.no_grad():
        ref = hf(torch.tensor(input_ids), attention_mask=torch.tensor(mask)).logits.numpy()

    model = NomicBertForPreTraining(config=cfg)
    out = model.apply(params, jnp.asarray(input_ids), jnp.asarray(mask))["prediction_logits"]
    err = masked_max_err(out, ref, mask)
    assert err < 5e-5, f"mlm logits err {err}"


def test_dense_seq_output_loss_equals_full_ce():
    """dense_seq_output (project only masked rows, reference
    modeling_nomic_bert.py:649-664) must produce exactly the same loss as
    the full-position label-masked CE, including -100 filler slots."""
    import jax
    import jax.numpy as jnp
    from contrastors_tpu.models.model_config import TrunkConfig
    from contrastors_tpu.models.nomic_bert import NomicBertForPreTraining
    from contrastors_tpu.trainers.mlm import dense_budget, masked_positions_static

    cfg = TrunkConfig(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=96, pad_token_id=0,
        n_positions=32, attn_impl="sdpa",
    )
    model = NomicBertForPreTraining(config=cfg)
    rng = np.random.default_rng(0)
    B, S = 4, 16
    ids = jnp.asarray(rng.integers(5, 90, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    labels = np.full((B, S), -100, np.int32)
    masked = rng.random((B, S)) < 0.3
    labels[masked] = rng.integers(5, 90, size=int(masked.sum()))
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    full = model.apply(params, ids, attention_mask=mask, labels=jnp.asarray(labels))
    k = dense_budget(S, 0.3)
    pos, lab = masked_positions_static(labels, k)
    dense = model.apply(
        params, ids, attention_mask=mask,
        labels=jnp.asarray(lab), masked_positions=jnp.asarray(pos),
    )
    np.testing.assert_allclose(float(dense["loss"]), float(full["loss"]), rtol=1e-6)
    # the dense head only projects k rows per batch row
    assert dense["prediction_logits"].shape == (B, k, cfg.vocab_size)

    # grads agree too (head fraction of the step is what the path changes)
    def loss_full(p):
        return model.apply(p, ids, attention_mask=mask, labels=jnp.asarray(labels))["loss"]

    def loss_dense(p):
        return model.apply(
            p, ids, attention_mask=mask,
            labels=jnp.asarray(lab), masked_positions=jnp.asarray(pos),
        )["loss"]

    gf = jax.grad(loss_full)(params)
    gd = jax.grad(loss_dense)(params)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf), jax.tree_util.tree_leaves_with_path(gd)
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(p1))


def test_xlmr_parity():
    torch.manual_seed(0)
    hf = XLMRobertaModel(
        XLMRobertaConfig(
            **{**SMALL, "pad_token_id": 1, "max_position_embeddings": 64 + 2}
        ),
        add_pooling_layer=False,
    ).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    rng = np.random.default_rng(3)
    input_ids, mask = random_batch(rng, pad_token_id=1)
    with torch.no_grad():
        ref = hf(torch.tensor(input_ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    model = NomicBertModel(config=cfg, add_pooling_layer=False)
    out = model.apply(params, jnp.asarray(input_ids), jnp.asarray(mask))["last_hidden_state"]
    err = masked_max_err(out, ref, mask)
    assert err < 2e-5, f"xlm-r err {err}"


def test_state_dict_round_trip():
    """flax -> HF naming -> flax must be exact (reference
    test_flash_bert.py:144-163)."""
    torch.manual_seed(0)
    hf = BertModel(BertConfig(**SMALL)).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    exported = flax_to_bert_state_dict(params, cfg)
    params2 = bert_state_dict_to_flax(exported, cfg)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a1), (p2, a2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_mean_pooled_embedding_cosine():
    """End-to-end embedding parity >= 0.999 cosine (BASELINE.md bar)."""
    torch.manual_seed(0)
    hf = BertModel(BertConfig(**SMALL)).eval()
    cfg = bert_config_to_trunk_config(hf.config)
    params = bert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    rng = np.random.default_rng(4)
    input_ids, mask = random_batch(rng)
    with torch.no_grad():
        h = hf(torch.tensor(input_ids), attention_mask=torch.tensor(mask)).last_hidden_state
        m = torch.tensor(mask).unsqueeze(-1).float()
        ref_emb = (h * m).sum(1) / m.sum(1)
        ref_emb = torch.nn.functional.normalize(ref_emb, dim=-1).numpy()

    from contrastors_tpu.models.biencoder import mean_pool

    out = NomicBertModel(config=cfg, add_pooling_layer=False).apply(
        params, jnp.asarray(input_ids), jnp.asarray(mask)
    )["last_hidden_state"]
    emb = mean_pool(out, jnp.asarray(mask))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    cos = np.sum(np.asarray(emb) * ref_emb, axis=-1)
    assert cos.min() > 0.999, cos
