"""Model factory: ModelArgs -> (flax module, params).

Counterpart of the reference BiEncoder's trunk dispatch
(reference: models/biencoder/modeling_biencoder.py:155-250), which sniffs the
model family from the checkpoint name. Offline-first: `model_name` may be a
local directory containing an HF config.json (+ model.safetensors /
pytorch_model.bin); `pretrained=false` builds random weights from the config.
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.config import ModelArgs
from contrastors_tpu.models.biencoder import BiEncoder
from contrastors_tpu.models.hf_interop import (
    bert_config_to_trunk_config,
    bert_state_dict_to_flax,
)
from contrastors_tpu.models.model_config import TrunkConfig


def _load_hf_config(path: str) -> Dict[str, Any]:
    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        return json.load(f)


def _load_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return {k: v.astype(np.float32) for k, v in load_file(st_path).items()}
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    return None


class _NS:
    def __init__(self, d):
        self.__dict__.update(d)


def sniff_family(model_type: str, model_name: str) -> str:
    name = (model_name or "").lower()
    if model_type in ("bert", "nomic_bert", "roberta", "xlm-roberta", "modernbert"):
        return "encoder"
    if model_type in ("gpt_neox", "llama", "gpt2", "open_lm", "openlm", "clip_text_model"):
        return "decoder"
    # a full CLIP config ("clip") loads as its vision tower here; the text
    # tower loads via model_type clip_text_model (hf_interop_decoder)
    if model_type in ("vit", "vit_mae", "clip", "clip_vision_model", "dinov2") or "vit" in name or "eva02" in name:
        return "vision"
    return "encoder"


def trunk_config_from_hf_dict(hf: Dict[str, Any], **overrides) -> Tuple[TrunkConfig, str]:
    model_type = hf.get("model_type", "bert")
    family = sniff_family(model_type, hf.get("_name_or_path", ""))
    ns = _NS(hf)
    if family == "encoder":
        if model_type == "modernbert":
            from contrastors_tpu.models.hf_interop import modernbert_config_to_trunk_config

            cfg = modernbert_config_to_trunk_config(hf, **overrides)
        else:
            cfg = bert_config_to_trunk_config(ns, **overrides)
    elif family == "decoder":
        if model_type in ("open_lm", "openlm"):
            from contrastors_tpu.models.hf_interop_decoder import open_lm_config_to_trunk_config

            cfg = open_lm_config_to_trunk_config(hf, **overrides)
        elif model_type == "clip_text_model":
            from contrastors_tpu.models.hf_interop_decoder import clip_text_config_to_trunk_config

            cfg = clip_text_config_to_trunk_config(hf, **overrides)
        else:
            from contrastors_tpu.models.hf_interop_decoder import decoder_config_to_trunk_config

            cfg = decoder_config_to_trunk_config(hf, **overrides)
    else:
        from contrastors_tpu.models.hf_interop_vit import vit_config_to_trunk_config

        cfg = vit_config_to_trunk_config(hf, **overrides)
    return cfg, family


def load_biencoder(
    model_args: ModelArgs,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    trunk_overrides: Optional[Dict[str, Any]] = None,
) -> Tuple[BiEncoder, Any, TrunkConfig]:
    """Returns (module, params, trunk_config)."""
    path = model_args.checkpoint or model_args.model_name
    # timm names resolve to built-in presets (reference timm_vit.py:96-168);
    # a local dir of the same name may hold the weights
    from contrastors_tpu.models.hf_interop_timm import TIMM_PRESETS, normalize_timm_name

    if path is not None and normalize_timm_name(path) in TIMM_PRESETS:
        return _load_timm_biencoder(model_args, path, dtype, rng, trunk_overrides)
    if path is None or not os.path.isdir(path):
        raise FileNotFoundError(
            f"model path {path!r} not found locally. This framework is "
            "offline-first: pass a directory containing an HF config.json "
            "(and model weights for pretrained=true)."
        )
    hf_cfg = _load_hf_config(path)
    overrides = dict(trunk_overrides or {})
    overrides.setdefault("attn_impl", model_args.attn_impl)
    if model_args.num_experts:
        overrides.update(
            num_experts=model_args.num_experts,
            moe_top_k=model_args.moe_top_k,
            moe_every_n_layers=model_args.moe_every_n_layers,
            ffn_div=model_args.ffn_div,
            moe_normalize_expert_weights=model_args.moe_normalize_expert_weights,
            expert_choice_router=model_args.expert_choice_router,
            num_shared_experts=model_args.num_shared_experts,
            # "auto" is a trainer-level value (resolved per-mesh in
            # BaseTrainer.__init__); model construction outside a trainer
            # (encode/eval/export scripts) is single-host -> dropless
            moe_impl=(
                "dropless" if model_args.moe_impl == "auto" else model_args.moe_impl
            ),
        )
    if model_args.pad_vocab_to_multiple_of:
        overrides["pad_vocab_size_multiple"] = model_args.pad_vocab_to_multiple_of
    if (
        model_args.activation_function
        and "hidden_act" not in hf_cfg
        and "hidden_activation" not in hf_cfg  # modernbert spells it this way
        # families whose converter hard-codes the activation must not be
        # clobbered by ModelArgs' "gelu" default (open_lm is swiglu by
        # construction — overriding it builds a plain MLP that can't hold
        # the checkpoint's fc11/fc12 weights)
        and hf_cfg.get("model_type") not in ("open_lm", "openlm", "clip_text_model")
    ):
        overrides.setdefault("activation_function", model_args.activation_function)

    cfg, family = trunk_config_from_hf_dict(hf_cfg, **overrides)

    module = BiEncoder(
        config=cfg,
        trunk_type=family,
        pooling=model_args.pooling or "mean",
        projection_dim=model_args.projection_dim,
        hamming=model_args.hamming,
        freeze=model_args.freeze,
        dtype=dtype,
        remat=model_args.gradient_checkpointing,
    )

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if family == "vision":
        dummy = {"pixel_values": jnp.zeros((1, cfg.num_channels, cfg.img_size, cfg.img_size))}
    else:
        dummy = {
            "input_ids": jnp.zeros((1, 8), jnp.int32),
            "attention_mask": jnp.ones((1, 8), jnp.int32),
        }
    if model_args.pretrained:
        sd = _load_state_dict(path)
        if sd is None:
            raise FileNotFoundError(f"pretrained=true but no weights found in {path}")
        if family == "encoder":
            if hf_cfg.get("model_type") == "modernbert":
                from contrastors_tpu.models.hf_interop import modernbert_state_dict_to_flax

                trunk = modernbert_state_dict_to_flax(sd, cfg)
            else:
                trunk = bert_state_dict_to_flax(sd, cfg)
            if cfg.num_experts > 0:
                # dense checkpoint into an MoE config: replicate dense MLPs
                # into experts (reference modeling_nomic_bert.py:175-262)
                from contrastors_tpu.models.moe_interop import expand_dense_trunk_to_moe

                trunk = {"params": expand_dense_trunk_to_moe(trunk["params"], cfg)}
        elif family == "decoder":
            mt = hf_cfg.get("model_type", "gpt_neox")
            if mt in ("open_lm", "openlm"):
                from contrastors_tpu.models.hf_interop_decoder import open_lm_state_dict_to_flax

                trunk = open_lm_state_dict_to_flax(sd, cfg)
            elif mt == "clip_text_model":
                from contrastors_tpu.models.hf_interop_decoder import clip_text_state_dict_to_flax

                trunk = clip_text_state_dict_to_flax(sd, cfg)
            else:
                from contrastors_tpu.models.hf_interop_decoder import decoder_state_dict_to_flax

                trunk = decoder_state_dict_to_flax(sd, cfg, mt)
        else:
            from contrastors_tpu.models.hf_interop_vit import vit_state_dict_to_flax

            trunk = vit_state_dict_to_flax(sd, cfg, hf_cfg.get("model_type", "vit"))
        init_params = module.init(rng, **dummy)
        merged = _merge_trunk(init_params, trunk["params"])
        return module, merged, cfg
    else:
        params = module.init(rng, **dummy)
        return module, params, cfg


def _merge_trunk(init_params: Any, trunk_params: Dict) -> Any:
    """Overlay remapped trunk weights onto randomly-initialized params
    (pooling heads / projections stay random, like the reference's
    strict=False load)."""
    import flax

    init = flax.core.unfreeze(init_params) if hasattr(init_params, "unfreeze") else dict(init_params)
    target = init["params"]["trunk"]

    dropped = []

    def overlay(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    overlay(dst[k], v, path + "/" + k)
                else:
                    dropped.append(path + "/" + k + "/*")
            else:
                if k in dst:
                    expected = dst[k].shape
                    got = np.asarray(v).shape
                    if expected != got:
                        raise ValueError(f"shape mismatch at {path}/{k}: {expected} vs {got}")
                    dst[k] = jnp.asarray(v, dtype=dst[k].dtype)
                else:
                    dropped.append(path + "/" + k)

    overlay(target, trunk_params)
    if dropped:
        # a remapped checkpoint tensor with no home in the module means the
        # config disagrees with the checkpoint (e.g. gated fc11/fc12 weights
        # into a non-gated MLP) — silently keeping random init there would
        # produce garbage embeddings that 'load successfully' (the reference
        # asserts the analogous condition, modeling_nomic_bert.py:265-273)
        raise ValueError(
            f"{len(dropped)} remapped checkpoint tensors have no matching "
            f"module parameter (first few: {dropped[:8]}); the model config "
            "does not match this checkpoint"
        )
    return init


def _load_timm_biencoder(model_args, path, dtype, rng, trunk_overrides):
    from contrastors_tpu.models.hf_interop_timm import (
        timm_name_to_trunk_config,
        timm_state_dict_to_flax,
    )

    overrides = dict(trunk_overrides or {})
    overrides.setdefault("attn_impl", model_args.attn_impl)
    if model_args.patch_dropout:
        overrides["patch_dropout"] = model_args.patch_dropout
    cfg = timm_name_to_trunk_config(path, **overrides)
    module = BiEncoder(
        config=cfg,
        trunk_type="vision",
        pooling=model_args.pooling or "map",
        projection_dim=model_args.projection_dim,
        freeze=model_args.freeze,
        dtype=dtype,
        remat=model_args.gradient_checkpointing,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = {"pixel_values": jnp.zeros((1, cfg.num_channels, cfg.img_size, cfg.img_size))}
    params = module.init(rng, **dummy)
    if model_args.pretrained:
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"pretrained timm weights expected in local dir {path!r} "
                "(model.safetensors / pytorch_model.bin with timm naming)"
            )
        sd = _load_state_dict(path)
        if sd is None:
            raise FileNotFoundError(f"no weights found in {path}")
        trunk = timm_state_dict_to_flax(sd, cfg)
        params = _merge_trunk(params, trunk["params"])
    return module, params, cfg
