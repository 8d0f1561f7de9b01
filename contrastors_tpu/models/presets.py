"""Architecture presets for the flagship models (no checkpoint needed).

nomic-bert-2048 / nomic-embed-text-v1 trunk shape per the reference configs
(reference: configs/train/mlm.yaml:36-48 — swiglu, rotary, vocab pad 64;
bert-base geometry)."""

from contrastors_tpu.models.model_config import TrunkConfig


def nomic_bert_2048(**overrides) -> TrunkConfig:
    kw = dict(
        vocab_size=30528,
        n_positions=0,
        n_embd=768,
        n_layer=12,
        n_head=12,
        n_inner=3072,
        activation_function="swiglu",
        rotary_emb_fraction=1.0,
        rotary_emb_base=1000.0,
        max_trained_positions=2048,
        qkv_proj_bias=False,
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        type_vocab_size=2,
        pad_token_id=0,
        pad_vocab_size_multiple=64,
        layer_norm_epsilon=1e-12,
        prenorm=False,
        causal=False,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    kw.update(overrides)
    return TrunkConfig(**kw)


def bert_base(**overrides) -> TrunkConfig:
    kw = dict(
        vocab_size=30522,
        n_positions=512,
        n_embd=768,
        n_layer=12,
        n_head=12,
        n_inner=3072,
        activation_function="gelu",
        type_vocab_size=2,
        pad_token_id=0,
        prenorm=False,
        causal=False,
    )
    kw.update(overrides)
    return TrunkConfig(**kw)
