"""Causal decoder parity vs HF GPT-NeoX (parallel residual, partial rotary)
and Llama (GQA, swiglu, RMSNorm) — randomly initialized, fp32
(mirrors reference tests/test_flash_gptneox.py, test_flash_llama.py)."""

import numpy as np
import jax.numpy as jnp
import torch
from transformers import GPTNeoXConfig, GPTNeoXModel, LlamaConfig, LlamaModel

from contrastors_tpu.models.decoder import DecoderModel
from contrastors_tpu.models.hf_interop import torch_state_dict_to_numpy
from contrastors_tpu.models.hf_interop_decoder import (
    decoder_config_to_trunk_config,
    decoder_state_dict_to_flax,
)


def test_gptneox_parity():
    torch.manual_seed(0)
    hf_cfg = GPTNeoXConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        rotary_pct=0.25,
        use_parallel_residual=True,
        hidden_act="gelu",
        max_position_embeddings=64,
        attention_dropout=0.0,
        hidden_dropout=0.0,
    )
    hf = GPTNeoXModel(hf_cfg).eval()
    cfg = decoder_config_to_trunk_config(hf_cfg.to_dict())
    params = decoder_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg, "gpt_neox")

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 24))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()

    out = DecoderModel(config=cfg).apply(params, jnp.asarray(ids))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"gpt-neox err {err}"


def test_llama_parity_gqa():
    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=256,
        hidden_act="silu",
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        attention_bias=False,
        rope_theta=10000.0,
    )
    hf = LlamaModel(hf_cfg).eval()
    cfg = decoder_config_to_trunk_config(hf_cfg.to_dict())
    params = decoder_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg, "llama")

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 128, size=(2, 24))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()

    out = DecoderModel(config=cfg).apply(params, jnp.asarray(ids))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"llama err {err}"


def test_gptneox_causal_lm_parity():
    from transformers import GPTNeoXForCausalLM
    from contrastors_tpu.models.decoder_heads import DecoderForCausalLM

    torch.manual_seed(0)
    hf_cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, rotary_pct=0.25, use_parallel_residual=True,
        hidden_act="gelu", max_position_embeddings=64, tie_word_embeddings=False,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = decoder_config_to_trunk_config(hf_cfg.to_dict())
    sd = torch_state_dict_to_numpy(hf.state_dict())
    lm_head_w = sd.pop("embed_out.weight")
    params = decoder_state_dict_to_flax(sd, cfg, "gpt_neox")
    params["params"]["lm_head"] = {"kernel": np.ascontiguousarray(lm_head_w.T)}
    # nest trunk under "model"
    trunk = {k: v for k, v in params["params"].items() if k != "lm_head"}
    params = {"params": {"model": trunk, "lm_head": params["params"]["lm_head"]}}

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 20))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    model = DecoderForCausalLM(config=cfg)
    out = model.apply(params, jnp.asarray(ids))["logits"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 1e-4, f"causal lm logits err {err}"
    # loss path
    labels = jnp.asarray(ids)
    loss = model.apply(params, jnp.asarray(ids), labels=labels)["loss"]
    assert np.isfinite(float(loss))


def test_decoder_seq_classification_runs():
    from contrastors_tpu.models.decoder_heads import DecoderForSequenceClassification

    cfg = decoder_config_to_trunk_config(
        GPTNeoXConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, max_position_embeddings=64,
        ).to_dict(),
        num_labels=3,
    )
    model = DecoderForSequenceClassification(config=cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 128, size=(2, 12)))
    mask = jnp.asarray(np.stack([np.ones(12), np.r_[np.ones(7), np.zeros(5)]]).astype(np.int32))
    import jax

    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask, labels=jnp.asarray([0, 2]))
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(float(out["loss"]))
