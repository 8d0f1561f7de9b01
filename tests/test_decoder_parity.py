"""Causal decoder parity vs HF GPT-NeoX (parallel residual, partial rotary)
and Llama (GQA, swiglu, RMSNorm) — randomly initialized, fp32
(mirrors reference tests/test_flash_gptneox.py, test_flash_llama.py)."""

import jax
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


def test_clip_text_parity():
    from transformers import CLIPTextConfig, CLIPTextModel
    from contrastors_tpu.models.hf_interop_decoder import (
        clip_text_config_to_trunk_config,
        clip_text_state_dict_to_flax,
    )

    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=32, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = clip_text_config_to_trunk_config(hf_cfg.to_dict())
    params = clip_text_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    out = DecoderModel(config=cfg).apply(params, jnp.asarray(ids))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"clip text err {err}"


def test_open_lm_remap_and_rotary_head_dim():
    """open_lm layout loads and the rotary-over-heads quirk produces a
    different (finite) result than standard rotary."""
    from contrastors_tpu.models.hf_interop_decoder import (
        open_lm_config_to_trunk_config,
        open_lm_state_dict_to_flax,
    )

    hf = dict(model_type="openlm", vocab_size=128, hidden_dim=64, n_layers=2,
              n_heads=4, weight_tying=False, rotary_old=True)
    cfg = open_lm_config_to_trunk_config(hf)
    assert cfg.rotary_head_dim and cfg.activation_function == "swiglu"
    F = cfg.n_inner
    rng = np.random.default_rng(0)
    sd = {"tok_embeddings.weight": rng.normal(size=(128, 64)).astype(np.float32) * 0.02,
          "norm.weight": np.ones(64, np.float32), "norm.bias": np.zeros(64, np.float32),
          "output.weight": rng.normal(size=(128, 64)).astype(np.float32) * 0.02}
    for i in range(2):
        sd[f"layers.{i}.attention.in_proj.weight"] = rng.normal(size=(192, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.attention.out_proj.weight"] = rng.normal(size=(64, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.attention_norm.weight"] = np.ones(64, np.float32)
        sd[f"layers.{i}.attention_norm.bias"] = np.zeros(64, np.float32)
        sd[f"layers.{i}.ffn_norm.weight"] = np.ones(64, np.float32)
        sd[f"layers.{i}.ffn_norm.bias"] = np.zeros(64, np.float32)
        sd[f"layers.{i}.feed_forward.w12.weight"] = rng.normal(size=(2 * F, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.feed_forward.w3.weight"] = rng.normal(size=(64, F)).astype(np.float32) * 0.02
    params = open_lm_state_dict_to_flax(sd, cfg)

    ids = jnp.asarray(np.random.default_rng(1).integers(1, 128, size=(2, 12)))
    out_quirk = DecoderModel(config=cfg).apply(params, ids)["last_hidden_state"]
    out_std = DecoderModel(config=cfg.replace(rotary_head_dim=False)).apply(params, ids)["last_hidden_state"]
    assert np.isfinite(np.asarray(out_quirk)).all()
    assert np.abs(np.asarray(out_quirk) - np.asarray(out_std)).max() > 1e-4


def test_decoder_token_classification_and_qa_heads():
    """TokenClassification + QuestionAnswering decoder heads (reference
    flash_pythia.py:777-1235): finite losses, grads flow, shapes right."""
    import dataclasses

    from contrastors_tpu.models.decoder_heads import (
        DecoderForQuestionAnswering,
        DecoderForTokenClassification,
    )
    from contrastors_tpu.models.model_config import TrunkConfig

    cfg = TrunkConfig(
        n_embd=64, n_layer=2, n_head=4, n_inner=128, vocab_size=128,
        n_positions=0, rotary_emb_fraction=0.25, pad_token_id=0, causal=True,
        num_labels=5, attn_impl="sdpa",
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 120, size=(2, 16)), jnp.int32)
    mask = jnp.ones_like(ids)

    tok = DecoderForTokenClassification(config=cfg)
    labels = jnp.asarray(rng.integers(0, 5, size=(2, 16)), jnp.int32)
    labels = labels.at[:, -3:].set(-100)
    params = tok.init(jax.random.PRNGKey(0), ids, mask, labels=labels)
    out = tok.apply(params, ids, mask, labels=labels)
    assert out["logits"].shape == (2, 16, 5)
    assert np.isfinite(float(out["loss"]))
    g = jax.grad(lambda p: tok.apply(p, ids, mask, labels=labels)["loss"])(params)
    assert np.abs(np.asarray(g["params"]["classifier"]["kernel"])).max() > 0

    qa = DecoderForQuestionAnswering(config=cfg)
    sp = jnp.asarray([2, 100], jnp.int32)  # 100 > seqlen: must clamp, not crash
    ep = jnp.asarray([5, 7], jnp.int32)
    qparams = qa.init(jax.random.PRNGKey(1), ids, mask, start_positions=sp, end_positions=ep)
    qout = qa.apply(qparams, ids, mask, start_positions=sp, end_positions=ep)
    assert qout["start_logits"].shape == (2, 16)
    assert np.isfinite(float(qout["loss"]))


def test_open_lm_loads_through_factory(tmp_path):
    """load_biencoder must reach the open_lm converters from a model dir
    (regression: the factory once raised 'unsupported decoder model_type'
    despite full converter support existing)."""
    import json

    from safetensors.numpy import save_file

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.models.auto import load_biencoder
    from contrastors_tpu.models.hf_interop_decoder import open_lm_config_to_trunk_config

    hf = dict(model_type="open_lm", vocab_size=128, hidden_dim=64, n_layers=2,
              n_heads=4, weight_tying=False, rotary_old=False)
    cfg = open_lm_config_to_trunk_config(hf)
    F = cfg.n_inner
    rng = np.random.default_rng(0)
    sd = {"tok_embeddings.weight": rng.normal(size=(128, 64)).astype(np.float32) * 0.02,
          "norm.weight": np.ones(64, np.float32), "norm.bias": np.zeros(64, np.float32),
          "output.weight": rng.normal(size=(128, 64)).astype(np.float32) * 0.02}
    for i in range(2):
        sd[f"layers.{i}.attention.in_proj.weight"] = rng.normal(size=(192, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.attention.out_proj.weight"] = rng.normal(size=(64, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.attention_norm.weight"] = np.ones(64, np.float32)
        sd[f"layers.{i}.attention_norm.bias"] = np.zeros(64, np.float32)
        sd[f"layers.{i}.ffn_norm.weight"] = np.ones(64, np.float32)
        sd[f"layers.{i}.ffn_norm.bias"] = np.zeros(64, np.float32)
        sd[f"layers.{i}.feed_forward.w12.weight"] = rng.normal(size=(2 * F, 64)).astype(np.float32) * 0.02
        sd[f"layers.{i}.feed_forward.w3.weight"] = rng.normal(size=(64, F)).astype(np.float32) * 0.02

    d = tmp_path / "openlm"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf))
    save_file(sd, str(d / "model.safetensors"))

    margs = ModelArgs(model_type="encoder", model_name=str(d), pooling="last", pretrained=True)
    module, params, cfg2 = load_biencoder(margs)
    assert cfg2.causal and cfg2.activation_function == "swiglu"
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 127, size=(2, 8)))
    mask = jnp.ones_like(ids)
    # 'last' pooling needs EOS-terminated rows; use mean for the smoke
    out = module.apply(params, ids, mask, normalize=True)
    assert np.isfinite(np.asarray(out["embedding"], np.float32)).all()


def test_clip_text_loads_through_factory(tmp_path):
    """A clip_text_model dir loads through load_biencoder and matches the
    torch CLIP text tower (the factory once mis-sniffed it)."""
    import json

    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.models.auto import load_biencoder

    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=32, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    hf = CLIPTextModel(hf_cfg).eval()
    d = tmp_path / "clip_text"
    d.mkdir()
    cfg_dict = hf_cfg.to_dict()
    cfg_dict["model_type"] = "clip_text_model"
    (d / "config.json").write_text(json.dumps(cfg_dict))
    save_file(
        {k: np.ascontiguousarray(v) for k, v in torch_state_dict_to_numpy(hf.state_dict()).items()},
        str(d / "model.safetensors"),
    )

    margs = ModelArgs(model_type="encoder", model_name=str(d), pooling="mean", pretrained=True)
    module, params, cfg = load_biencoder(margs)
    assert cfg.causal and cfg.activation_function == "quick_gelu"

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    # mean-pooled unnormalized embedding must equal the torch tower's mean
    out = module.apply(params, jnp.asarray(ids), jnp.ones((2, 16), jnp.int32), normalize=False)
    emb = np.asarray(out["embedding"], np.float32)
    ref_mean = ref.mean(axis=1)
    np.testing.assert_allclose(emb, ref_mean, atol=5e-4)
