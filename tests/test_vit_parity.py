"""Vision tower parity vs HF ViT / CLIP-vision / DINOv2, randomly
initialized fp32 (mirrors reference tests/test_flash_vit.py,
test_flash_clip.py, test_flash_dinov2.py)."""

import numpy as np
import jax.numpy as jnp
import torch
from transformers import (
    CLIPVisionConfig,
    CLIPVisionModel,
    Dinov2Config,
    Dinov2Model,
    ViTConfig,
    ViTModel as HFViTModel,
)

from contrastors_tpu.models.hf_interop import torch_state_dict_to_numpy
from contrastors_tpu.models.hf_interop_vit import (
    vit_config_to_trunk_config,
    vit_state_dict_to_flax,
)
from contrastors_tpu.models.vit import ViTModel


def _pixels(rng, b=2, c=3, s=32):
    return rng.normal(size=(b, c, s, s)).astype(np.float32)


def test_hf_vit_parity():
    torch.manual_seed(0)
    hf_cfg = ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = HFViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = vit_config_to_trunk_config(hf_cfg.to_dict())
    params = vit_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg, "vit")

    rng = np.random.default_rng(0)
    px = _pixels(rng)
    with torch.no_grad():
        ref = hf(torch.tensor(px)).last_hidden_state.numpy()
    out = ViTModel(config=cfg).apply(params, jnp.asarray(px))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"hf-vit err {err}"


def test_sincos_2d_matches_mae():
    """Regression: the fixed 2-D sin/cos table must equal transformers'
    ViTMAE builder exactly — the first half encodes the W coordinate
    (the reference's emb_h name is misleading, embedding.py:66-70); the
    halves were once concatenated in the opposite order."""
    from transformers.models.vit_mae.modeling_vit_mae import get_2d_sincos_pos_embed

    from contrastors_tpu.layers.embeddings import sincos_2d_pos_embed

    for dim, grid in ((64, 4), (96, 7)):
        ours = np.asarray(sincos_2d_pos_embed(dim, grid, cls_token=True))
        ref = np.asarray(get_2d_sincos_pos_embed(dim, grid, add_cls_token=True))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_vit_mae_parity():
    """ViT-MAE encoder: sinusoidal (non-learned) position table is
    regenerated locally on load — outputs must match transformers."""
    from transformers import ViTMAEConfig, ViTMAEModel

    torch.manual_seed(0)
    hf_cfg = ViTMAEConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        mask_ratio=0.0,  # keep every patch so hidden states align
    )
    hf = ViTMAEModel(hf_cfg).eval()
    cfg = vit_config_to_trunk_config(hf_cfg.to_dict())
    params = vit_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg, "vit_mae")

    rng = np.random.default_rng(0)
    px = _pixels(rng)
    with torch.no_grad():
        o = hf(torch.tensor(px))
        # MAE shuffles patches even at mask_ratio=0 — restore the order
        patches = o.last_hidden_state[:, 1:]
        restore = o.ids_restore[..., None].expand(-1, -1, patches.shape[-1])
        ref = torch.cat(
            [o.last_hidden_state[:, :1], torch.gather(patches, 1, restore)], dim=1
        ).numpy()
    out = ViTModel(config=cfg).apply(params, jnp.asarray(px))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"vit-mae err {err}"


def test_clip_vision_parity():
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = vit_config_to_trunk_config(hf_cfg.to_dict())
    sd = torch_state_dict_to_numpy(hf.state_dict())
    params = vit_state_dict_to_flax(sd, cfg, "clip_vision_model")

    rng = np.random.default_rng(1)
    px = _pixels(rng)
    with torch.no_grad():
        # CLIP applies post_layernorm only to the pooled CLS; our ViT
        # (like the reference's, models/vit/clip.py) applies ln_f to the
        # whole sequence — CLS rows must agree.
        ref_pooled = hf(torch.tensor(px)).pooler_output.numpy()
    out = ViTModel(config=cfg).apply(params, jnp.asarray(px))["last_hidden_state"]
    err = np.abs(np.asarray(out)[:, 0] - ref_pooled).max()
    assert err < 5e-5, f"clip cls err {err}"


def test_dinov2_parity():
    torch.manual_seed(0)
    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layerscale_value=1.0,
    )
    hf = Dinov2Model(hf_cfg).eval()
    cfg = vit_config_to_trunk_config(hf_cfg.to_dict())
    params = vit_state_dict_to_flax(torch_state_dict_to_numpy(hf.state_dict()), cfg, "dinov2")

    rng = np.random.default_rng(2)
    px = _pixels(rng)
    with torch.no_grad():
        ref = hf(torch.tensor(px)).last_hidden_state.numpy()
    out = ViTModel(config=cfg).apply(params, jnp.asarray(px))["last_hidden_state"]
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 5e-5, f"dinov2 err {err}"


def test_timm_eva02_state_dict_load_and_forward():
    """EVA02 geometry: 2-D rope, swiglu with post-activation LN, no final LN.
    Built from a synthetic timm-style state dict (timm isn't installed
    offline); exercises the full remap + forward path."""
    import jax
    from contrastors_tpu.models.hf_interop_timm import (
        timm_name_to_trunk_config,
        timm_state_dict_to_flax,
    )

    cfg = timm_name_to_trunk_config(
        "timm/vit_eva02_base_patch16_224.mim_in22k",
        n_embd=64, n_layer=2, n_head=4, n_inner=128, img_size=32, patch_size=8,
        ref_feat_shape=(4, 4), attn_impl="sdpa",
    )
    rng = np.random.default_rng(0)
    D, F, P = 64, 128, 8
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(D, 3, P, P)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(D, np.float32),
        "cls_token": rng.normal(size=(1, 1, D)).astype(np.float32) * 0.02,
        "pos_embed": rng.normal(size=(1, 17, D)).astype(np.float32) * 0.02,
    }
    for i in range(2):
        sd[f"blocks.{i}.attn.q_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.attn.k_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.attn.v_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.attn.q_bias"] = np.zeros(D, np.float32)
        sd[f"blocks.{i}.attn.v_bias"] = np.zeros(D, np.float32)
        sd[f"blocks.{i}.attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.attn.proj.bias"] = np.zeros(D, np.float32)
        for n in ("norm1", "norm2"):
            sd[f"blocks.{i}.{n}.weight"] = np.ones(D, np.float32)
            sd[f"blocks.{i}.{n}.bias"] = np.zeros(D, np.float32)
        sd[f"blocks.{i}.mlp.fc1_x.weight"] = rng.normal(size=(F, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.mlp.fc1_x.bias"] = np.zeros(F, np.float32)
        sd[f"blocks.{i}.mlp.fc1_g.weight"] = rng.normal(size=(F, D)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.mlp.fc1_g.bias"] = np.zeros(F, np.float32)
        sd[f"blocks.{i}.mlp.fc2.weight"] = rng.normal(size=(D, F)).astype(np.float32) * 0.02
        sd[f"blocks.{i}.mlp.fc2.bias"] = np.zeros(D, np.float32)
        sd[f"blocks.{i}.mlp.norm.weight"] = np.ones(F, np.float32)
        sd[f"blocks.{i}.mlp.norm.bias"] = np.zeros(F, np.float32)

    params = timm_state_dict_to_flax(sd, cfg)
    model = ViTModel(config=cfg)
    ref_init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
    flat_a = {jax.tree_util.keystr(p): np.asarray(a).shape for p, a in jax.tree_util.tree_leaves_with_path(params["params"])}
    flat_b = {jax.tree_util.keystr(p): np.asarray(a).shape for p, a in jax.tree_util.tree_leaves_with_path(ref_init)}
    assert flat_a == flat_b, set(flat_a) ^ set(flat_b)

    px = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    out = model.apply(params, px)["last_hidden_state"]
    assert out.shape == (2, 17, 64)
    assert np.isfinite(np.asarray(out)).all()
