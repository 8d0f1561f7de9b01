"""Checkpoint export: flax train state -> HuggingFace torch-loadable dir.

TPU counterpart of the reference convert_to_hf.py (reference:
convert_to_hf.py:8-40 + the inverse remaps models/encoder/bert.py:260-366 +
the hub-side torch model models/huggingface/modeling_hf_nomic_bert.py).
Strips a BiEncoder checkpoint to its trunk and writes an HF dir:
  * vanilla absolute-position trunks -> model_type "bert", loadable by
    `transformers.BertModel.from_pretrained` directly;
  * flagship rotary / gated-MLP / rms-norm trunks -> a trust_remote_code
    package (model_type "nomic_bert" + self-contained modeling file,
    models/modeling_nomic_bert_hf.py) loadable via
    `AutoModel.from_pretrained(dir, trust_remote_code=True)`.
push_to_hub is a network call away in a connected environment.

Usage:
  python -m contrastors_tpu.export --ckpt_path ckpts/run/step_N \
      --output export_dir [--vision]
"""

import argparse
import json
import os
from typing import Optional

import numpy as np

from contrastors_tpu.models.hf_interop import flax_to_bert_state_dict
from contrastors_tpu.models.model_config import TrunkConfig


def trunk_config_to_hf_bert_dict(cfg: TrunkConfig, orig_vocab_size: Optional[int] = None) -> dict:
    """Inverse of bert_config_to_trunk_config
    (reference bert.py:53-72 nomic_config_to_bert_config)."""
    return {
        "architectures": ["BertModel"],
        "model_type": "bert",
        "vocab_size": orig_vocab_size or cfg.vocab_size,
        "hidden_size": cfg.n_embd,
        "num_hidden_layers": cfg.n_layer,
        "num_attention_heads": cfg.n_head,
        "intermediate_size": cfg.n_inner,
        "hidden_act": cfg.activation_function,
        "hidden_dropout_prob": cfg.resid_pdrop,
        "attention_probs_dropout_prob": cfg.attn_pdrop,
        "max_position_embeddings": cfg.n_positions,
        "type_vocab_size": cfg.type_vocab_size,
        "initializer_range": cfg.initializer_range,
        "layer_norm_eps": cfg.layer_norm_epsilon,
        "pad_token_id": cfg.pad_token_id,
        "position_embedding_type": "absolute",
        # nomic extensions consumed by the hub-side trust_remote_code model
        "rotary_emb_fraction": cfg.rotary_emb_fraction,
        "rotary_emb_base": cfg.rotary_emb_base,
        "use_rms_norm": cfg.use_rms_norm,
        "qkv_proj_bias": cfg.qkv_proj_bias,
        "mlp_fc1_bias": cfg.mlp_fc1_bias,
        "mlp_fc2_bias": cfg.mlp_fc2_bias,
    }


def _needs_nomic_export(cfg: TrunkConfig) -> bool:
    """Vanilla BertModel silently ignores rotary/gated-MLP keys — exporting
    such a trunk as model_type 'bert' yields wrong embeddings (the round-1
    flagship-export gap). Those trunks need the trust_remote_code package."""
    from contrastors_tpu.layers.activations import is_gated

    return cfg.rotary_emb_fraction > 0 or is_gated(cfg.activation_function) or bool(cfg.use_rms_norm)


def trunk_config_to_nomic_hf_dict(cfg: TrunkConfig, orig_vocab_size: Optional[int] = None) -> dict:
    return {
        "architectures": ["NomicBertModel"],
        "model_type": "nomic_bert",
        "auto_map": {
            "AutoConfig": "modeling_nomic_bert.NomicBertConfig",
            "AutoModel": "modeling_nomic_bert.NomicBertModel",
            "AutoModelForMaskedLM": "modeling_nomic_bert.NomicBertForMaskedLM",
        },
        "vocab_size": orig_vocab_size or cfg.vocab_size,
        "hidden_size": cfg.n_embd,
        "num_hidden_layers": cfg.n_layer,
        "num_attention_heads": cfg.n_head,
        "intermediate_size": cfg.n_inner,
        "hidden_act": cfg.activation_function,
        "hidden_dropout_prob": cfg.resid_pdrop,
        "attention_probs_dropout_prob": cfg.attn_pdrop,
        "max_position_embeddings": cfg.n_positions,
        "type_vocab_size": cfg.type_vocab_size,
        "initializer_range": cfg.initializer_range,
        "layer_norm_eps": cfg.layer_norm_epsilon,
        "pad_token_id": cfg.pad_token_id,
        "rotary_emb_fraction": cfg.rotary_emb_fraction,
        "rotary_emb_base": cfg.rotary_emb_base,
        "rotary_emb_interleaved": cfg.rotary_emb_interleaved,
        "max_trained_positions": cfg.max_trained_positions,
        "qkv_proj_bias": cfg.qkv_proj_bias,
        "mlp_fc1_bias": cfg.mlp_fc1_bias,
        "mlp_fc2_bias": cfg.mlp_fc2_bias,
        "use_rms_norm": bool(cfg.use_rms_norm),
        "norm_bias": bool(cfg.norm_bias),
        "prenorm": bool(cfg.prenorm),
        "skip_first_prenorm": bool(cfg.skip_first_prenorm),
        "sliding_window": cfg.sliding_window,
        "global_attn_every_n_layers": cfg.global_attn_every_n_layers,
        "local_rope_theta": cfg.local_rotary_emb_base,
    }


def export_nomic_bert_trunk(
    trunk_params: dict,
    cfg: TrunkConfig,
    output_dir: str,
    orig_vocab_size: Optional[int] = None,
):
    """Write a runnable trust_remote_code package for the flagship
    rotary+swiglu architecture: config.json (model_type nomic_bert +
    auto_map), the self-contained torch modeling file, and flash-named
    safetensors (reference role: convert_to_hf.py:8-40 +
    models/huggingface/modeling_hf_nomic_bert.py)."""
    import shutil

    from safetensors.numpy import save_file

    from contrastors_tpu.models import modeling_nomic_bert_hf
    from contrastors_tpu.models.hf_interop import flax_to_nomic_state_dict

    sd = flax_to_nomic_state_dict(trunk_params, cfg)
    if orig_vocab_size and orig_vocab_size < cfg.vocab_size:
        sd["embeddings.word_embeddings.weight"] = sd["embeddings.word_embeddings.weight"][
            :orig_vocab_size
        ]

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(trunk_config_to_nomic_hf_dict(cfg, orig_vocab_size), f, indent=2)
    shutil.copyfile(
        modeling_nomic_bert_hf.__file__, os.path.join(output_dir, "modeling_nomic_bert.py")
    )
    save_file(
        {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()},
        os.path.join(output_dir, "model.safetensors"),
    )
    return output_dir


def export_bert_trunk(
    trunk_params: dict,
    cfg: TrunkConfig,
    output_dir: str,
    orig_vocab_size: Optional[int] = None,
    strip_bert_prefix: bool = True,
):
    """trunk_params: the flax params of NomicBertModel ({"params": {...}} or
    the inner dict). Writes config.json + model.safetensors. Trunks that a
    vanilla BertModel cannot represent are routed to the trust_remote_code
    package automatically."""
    from safetensors.numpy import save_file

    if _needs_nomic_export(cfg):
        return export_nomic_bert_trunk(trunk_params, cfg, output_dir, orig_vocab_size)

    sd = flax_to_bert_state_dict(trunk_params, cfg)
    if orig_vocab_size and orig_vocab_size < cfg.vocab_size:
        # un-pad the vocab (reference bert.py:269-277)
        sd["bert.embeddings.word_embeddings.weight"] = sd[
            "bert.embeddings.word_embeddings.weight"
        ][:orig_vocab_size]
    if strip_bert_prefix:
        sd = {k.removeprefix("bert."): v for k, v in sd.items()}

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(trunk_config_to_hf_bert_dict(cfg, orig_vocab_size), f, indent=2)
    save_file(
        {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()},
        os.path.join(output_dir, "model.safetensors"),
    )
    return output_dir


def load_orbax_state(ckpt_path: str):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(os.path.abspath(ckpt_path), "state"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--config_json", help="TrunkConfig json (saved by the trainer)")
    parser.add_argument("--vision", action="store_true")
    parser.add_argument("--orig_vocab_size", type=int, default=None)
    args = parser.parse_args()

    state = load_orbax_state(args.ckpt_path)
    params = state["params"]
    if "model" in params:  # TextTextTrainer layout
        params = params["model"]
    inner = params["params"] if "params" in params else params
    tower = inner.get("vision" if args.vision else "trunk", inner)
    if "trunk" in tower:
        tower = tower["trunk"]

    if args.config_json:
        cfg = TrunkConfig.from_json(open(args.config_json).read())
    else:
        raise SystemExit("--config_json is required (the trainer writes trunk_config.json)")
    if args.vision:
        export_vit_trunk({"params": tower}, cfg, args.output)
    else:
        export_bert_trunk({"params": tower}, cfg, args.output, args.orig_vocab_size)
    print(f"exported to {args.output}")


def trunk_config_to_hf_vit_dict(cfg: TrunkConfig) -> dict:
    return {
        "architectures": ["ViTModel"],
        "model_type": "vit",
        "hidden_size": cfg.n_embd,
        "num_hidden_layers": cfg.n_layer,
        "num_attention_heads": cfg.n_head,
        "intermediate_size": cfg.n_inner,
        "hidden_act": cfg.activation_function,
        "image_size": cfg.img_size,
        "patch_size": cfg.patch_size,
        "num_channels": cfg.num_channels,
        "layer_norm_eps": cfg.layer_norm_epsilon,
        "hidden_dropout_prob": cfg.resid_pdrop,
        "attention_probs_dropout_prob": cfg.attn_pdrop,
        "qkv_bias": cfg.qkv_proj_bias,
    }


def export_vit_trunk(trunk_params: dict, cfg: TrunkConfig, output_dir: str):
    """flax ViT trunk -> HF ViTModel dir (reference convert_to_hf.py:24-35
    vision branch)."""
    from safetensors.numpy import save_file

    from contrastors_tpu.models.hf_interop_vit import flax_to_hf_vit_state_dict

    sd = flax_to_hf_vit_state_dict(trunk_params, cfg)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(trunk_config_to_hf_vit_dict(cfg), f, indent=2)
    save_file(
        {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()},
        os.path.join(output_dir, "model.safetensors"),
    )
    return output_dir


if __name__ == "__main__":
    main()
