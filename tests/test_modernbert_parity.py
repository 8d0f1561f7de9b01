"""ModernBERT trunk parity vs transformers (the reference ships modernbert
recipes but no model code — this framework actually loads and runs them).
Covers: prenorm with skipped layer-0 norm, alternating global / sliding-
window local attention, per-layer rotary bases, GeGLU fused-Wi split,
bias-free norms, final_norm."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from contrastors_tpu.models.hf_interop import (
    modernbert_config_to_trunk_config,
    modernbert_state_dict_to_flax,
    torch_state_dict_to_numpy,
)
from contrastors_tpu.models.nomic_bert import NomicBertModel


def make_hf(seed=0, layers=5):
    from transformers import ModernBertConfig, ModernBertModel

    torch.manual_seed(seed)
    cfg = ModernBertConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=layers,
        num_attention_heads=4,
        intermediate_size=96,
        global_attn_every_n_layers=3,
        local_attention=8,
        max_position_embeddings=64,
        global_rope_theta=160000.0,
        local_rope_theta=10000.0,
        pad_token_id=0,
        embedding_dropout=0.0,
        mlp_dropout=0.0,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    return cfg, ModernBertModel(cfg).eval()


def test_modernbert_forward_parity():
    hf_cfg, hf = make_hf()
    cfg = modernbert_config_to_trunk_config(hf_cfg.to_dict(), attn_impl="sdpa")
    assert cfg.prenorm and cfg.skip_first_prenorm
    assert cfg.sliding_window == 8 and cfg.global_attn_every_n_layers == 3
    params = modernbert_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg)
    # layer 0 must have no norm1 params
    assert "norm1" not in params["params"]["layers_0"]
    assert "norm1" in params["params"]["layers_1"]

    model = NomicBertModel(config=cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 250, size=(3, 24))
    lengths = [24, 17, 9]
    mask = np.array([[1] * l + [0] * (24 - l) for l in lengths])

    with torch.no_grad():
        ref = hf(
            torch.tensor(ids).long(), attention_mask=torch.tensor(mask).long()
        ).last_hidden_state.numpy()

    out = model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )["last_hidden_state"]
    out = np.asarray(out)
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(out[b, :l], ref[b, :l], atol=5e-5, rtol=1e-4)


def test_modernbert_via_biencoder_checkpoint(tmp_path):
    """End-to-end: a local ModernBERT checkpoint dir loads through
    load_biencoder (family sniffing + remap) and mean-pooled embeddings
    match HF's masked mean."""
    from safetensors.torch import save_file

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.models.auto import load_biencoder

    hf_cfg, hf = make_hf(seed=1, layers=3)
    ckpt = tmp_path / "tiny-modernbert"
    ckpt.mkdir()
    hf_cfg.save_pretrained(str(ckpt))
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        str(ckpt / "model.safetensors"),
    )

    module, params, cfg = load_biencoder(
        ModelArgs(model_type="encoder", model_name=str(ckpt), pooling="mean", attn_impl="sdpa")
    )
    assert cfg.activation_function == "geglu"

    rng = np.random.default_rng(2)
    ids = rng.integers(5, 250, size=(2, 16))
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0
    out = module.apply(
        params,
        input_ids=jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32),
        normalize=False,
    )["embedding"]

    with torch.no_grad():
        h = hf(torch.tensor(ids).long(), attention_mask=torch.tensor(mask)).last_hidden_state
        m = torch.tensor(mask)[:, :, None].float()
        ref = (h * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-5, rtol=1e-4)
