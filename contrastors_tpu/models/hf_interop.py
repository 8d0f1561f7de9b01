"""HF torch checkpoint <-> flax pytree remaps.

TPU counterpart of the reference remap layer
(reference: models/encoder/bert.py:75-366, models/decoder/{gpt_neox,llama,
open_lm,clip_decoder}.py, models/vit/*.py). Works on plain numpy dicts so
torch is only needed by the caller; torch [out, in] kernels transpose to
flax [in, out].

Both source layouts are accepted for the BERT family:
  * vanilla HF BERT/RoBERTa (q/k/v split, intermediate/output naming);
  * nomic-bert flash layout (fused Wqkv, fc11/fc12) as shipped on the hub.
"""

import re
from typing import Dict, Optional

import numpy as np

from contrastors_tpu.models.model_config import TrunkConfig

Array = np.ndarray


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def set_path(tree: dict, path: str, value: Array):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# ---------------------------------------------------------------------------
# config converters
# ---------------------------------------------------------------------------


def bert_config_to_trunk_config(hf_config, **overrides) -> TrunkConfig:
    """transformers BertConfig / XLM-R config / NomicBertConfig(GPT2-style)
    -> TrunkConfig (reference bert.py:11-50)."""
    g = lambda *names, default=None: next(
        (getattr(hf_config, n) for n in names if getattr(hf_config, n, None) is not None), default
    )
    kw = dict(
        vocab_size=g("vocab_size"),
        n_positions=g("max_position_embeddings", "n_positions", default=0),
        n_embd=g("hidden_size", "n_embd"),
        n_layer=g("num_hidden_layers", "n_layer"),
        n_head=g("num_attention_heads", "n_head"),
        n_inner=g("intermediate_size", "n_inner"),
        activation_function=g("hidden_act", "activation_function", default="gelu"),
        resid_pdrop=g("hidden_dropout_prob", "resid_pdrop", default=0.0),
        embd_pdrop=g("hidden_dropout_prob", "embd_pdrop", default=0.0),
        attn_pdrop=g("attention_probs_dropout_prob", "attn_pdrop", default=0.0),
        layer_norm_epsilon=g("layer_norm_eps", "layer_norm_epsilon", default=1e-12),
        initializer_range=g("initializer_range", default=0.02),
        prenorm=False,
        causal=False,
        rotary_emb_fraction=g("rotary_emb_fraction", default=0.0),
        rotary_emb_base=g("rotary_emb_base", default=10_000),
        rotary_emb_interleaved=bool(g("rotary_emb_interleaved", default=False)),
        qkv_proj_bias=bool(g("qkv_proj_bias", default=True)),
        mlp_fc1_bias=bool(g("mlp_fc1_bias", default=True)),
        mlp_fc2_bias=bool(g("mlp_fc2_bias", default=True)),
        use_rms_norm=bool(g("use_rms_norm", default=False)),
        type_vocab_size=g("type_vocab_size", default=0),
        pad_token_id=g("pad_token_id", default=None),
        pad_vocab_size_multiple=g("pad_vocab_to_multiple_of", "pad_vocab_size_multiple", default=1),
        max_trained_positions=g("max_trained_positions", default=2048),
        # DynamicNTK long-context inference knob on NomicBertConfig
        rotary_scaling_factor=g("rotary_scaling_factor", default=None),
        # NomicBertConfig carries this explicitly (configuration_nomic_bert.py:26);
        # an explicit false in config.json must win over the TrunkConfig default
        dense_seq_output=bool(g("dense_seq_output", default=True)),
    )
    kw.update(overrides)
    return TrunkConfig(**kw)


# ---------------------------------------------------------------------------
# BERT family: HF torch -> flax params for NomicBertModel / heads
# ---------------------------------------------------------------------------


def normalize_bert_keys(sd: Dict[str, Array]) -> Dict[str, Array]:
    """Canonicalize prefixes/layouts to the flash naming
    (mirrors reference bert.py:85-197 semantics, independent code)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^roberta\.", "", k)
        k = re.sub(r"^bert\.", "", k)
        k = re.sub(r"LayerNorm\.gamma$", "LayerNorm.weight", k)
        k = re.sub(r"LayerNorm\.beta$", "LayerNorm.bias", k)
        k = re.sub(r"^encoder\.layer\.", "encoder.layers.", k)
        out[k] = v
    sd = out
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^embeddings\.LayerNorm\.", "emb_ln.", k)
        k = re.sub(
            r"^encoder\.layers\.(\d+)\.attention\.output\.LayerNorm\.(weight|bias)",
            r"encoder.layers.\1.norm1.\2",
            k,
        )
        k = re.sub(
            r"^encoder\.layers\.(\d+)\.output\.LayerNorm\.(weight|bias)",
            r"encoder.layers.\1.norm2.\2",
            k,
        )
        k = re.sub(
            r"^encoder\.layers\.(\d+)\.intermediate\.dense\.(weight|bias)",
            r"encoder.layers.\1.mlp.fc1.\2",
            k,
        )
        k = re.sub(
            r"^encoder\.layers\.(\d+)\.output\.dense\.(weight|bias)",
            r"encoder.layers.\1.mlp.fc2.\2",
            k,
        )
        k = re.sub(
            r"^encoder\.layers\.(\d+)\.attention\.output\.dense\.(weight|bias)",
            r"encoder.layers.\1.attn.out_proj.\2",
            k,
        )
        k = re.sub(r"^cls\.predictions\.transform\.LayerNorm\.", "cls.predictions.transform.layer_norm.", k)
        k = re.sub(r"^cls\.predictions\.bias$", "cls.predictions.decoder.bias", k)
        k = re.sub(r"^lm_head\.bias$", "cls.predictions.decoder.bias", k)
        k = re.sub(r"^lm_head\.dense\.", "cls.predictions.transform.dense.", k)
        k = re.sub(r"^lm_head\.layer_norm\.", "cls.predictions.transform.layer_norm.", k)
        k = re.sub(r"^lm_head\.decoder\.weight$", "cls.predictions.decoder.weight", k)
        out[k] = v
    sd = out

    # fuse q/k/v
    layer_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"encoder\.layers\.(\d+)\.attention\.self\.query\.weight", k))}
    )
    for i in layer_ids:
        pre = f"encoder.layers.{i}.attention.self"
        wq, wk, wv = (sd.pop(f"{pre}.{n}.weight") for n in ("query", "key", "value"))
        sd[f"encoder.layers.{i}.attn.Wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
        if f"{pre}.query.bias" in sd:
            bq, bk, bv = (sd.pop(f"{pre}.{n}.bias") for n in ("query", "key", "value"))
            sd[f"encoder.layers.{i}.attn.Wqkv.bias"] = np.concatenate([bq, bk, bv], axis=0)

    sd.pop("cls.seq_relationship.weight", None)
    sd.pop("cls.seq_relationship.bias", None)
    sd.pop("embeddings.position_ids", None)
    return sd


def bert_state_dict_to_flax(
    sd: Dict[str, Array],
    config: TrunkConfig,
    head: Optional[str] = None,  # None (trunk) | "pretraining" | "classification"
    add_pooling_layer: bool = False,
) -> dict:
    """Returns {"params": ...} for NomicBertModel (head=None) or the given
    head model (param tree has the trunk under "bert")."""
    sd = dict(normalize_bert_keys(sd))

    # vocab padding (reference bert.py:212-230)
    w = sd["embeddings.word_embeddings.weight"]
    if config.vocab_size > w.shape[0]:
        pad = config.vocab_size - w.shape[0]
        sd["embeddings.word_embeddings.weight"] = np.pad(w, ((0, pad), (0, 0)))
        if "cls.predictions.decoder.weight" in sd:
            dw = sd["cls.predictions.decoder.weight"]
            sd["cls.predictions.decoder.weight"] = np.pad(dw, ((0, pad), (0, 0)))
        if "cls.predictions.decoder.bias" in sd:
            db = sd["cls.predictions.decoder.bias"]
            sd["cls.predictions.decoder.bias"] = np.pad(db, (0, pad), constant_values=-100.0)

    trunk: dict = {}
    set_path(trunk, "embeddings/word_embeddings/embedding", sd.pop("embeddings.word_embeddings.weight"))
    if "embeddings.position_embeddings.weight" in sd:
        if config.rotary_emb_fraction <= 0:
            set_path(
                trunk,
                "embeddings/position_embeddings/embedding",
                sd.pop("embeddings.position_embeddings.weight"),
            )
        else:
            sd.pop("embeddings.position_embeddings.weight")
    if "embeddings.token_type_embeddings.weight" in sd:
        set_path(
            trunk,
            "embeddings/token_type_embeddings/embedding",
            sd.pop("embeddings.token_type_embeddings.weight"),
        )
    set_path(trunk, "emb_ln/weight", sd.pop("emb_ln.weight"))
    set_path(trunk, "emb_ln/bias", sd.pop("emb_ln.bias"))

    for i in range(config.n_layer):
        src = f"encoder.layers.{i}"
        dst = f"layers_{i}"
        set_path(trunk, f"{dst}/attn/Wqkv/kernel", _t(sd.pop(f"{src}.attn.Wqkv.weight")))
        if f"{src}.attn.Wqkv.bias" in sd:
            set_path(trunk, f"{dst}/attn/Wqkv/bias", sd.pop(f"{src}.attn.Wqkv.bias"))
        set_path(trunk, f"{dst}/attn/out_proj/kernel", _t(sd.pop(f"{src}.attn.out_proj.weight")))
        if f"{src}.attn.out_proj.bias" in sd:
            set_path(trunk, f"{dst}/attn/out_proj/bias", sd.pop(f"{src}.attn.out_proj.bias"))
        for norm in ("norm1", "norm2"):
            set_path(trunk, f"{dst}/{norm}/weight", sd.pop(f"{src}.{norm}.weight"))
            if f"{src}.{norm}.bias" in sd:
                set_path(trunk, f"{dst}/{norm}/bias", sd.pop(f"{src}.{norm}.bias"))
        for fc in ("fc1", "fc2", "fc11", "fc12"):
            wk = f"{src}.mlp.{fc}.weight"
            if wk in sd:
                set_path(trunk, f"{dst}/mlp/{fc}/kernel", _t(sd.pop(wk)))
                bk = f"{src}.mlp.{fc}.bias"
                if bk in sd:
                    set_path(trunk, f"{dst}/mlp/{fc}/bias", sd.pop(bk))

    if add_pooling_layer and "pooler.dense.weight" in sd:
        set_path(trunk, "pooler_dense/kernel", _t(sd.pop("pooler.dense.weight")))
        set_path(trunk, "pooler_dense/bias", sd.pop("pooler.dense.bias"))

    if head is None:
        return {"params": trunk}

    params: dict = {"bert": trunk}
    if head == "pretraining":
        # head weights may be absent (trunk-only checkpoints) — keep random init
        if "cls.predictions.transform.dense.weight" in sd:
            set_path(params, "transform_dense/kernel", _t(sd.pop("cls.predictions.transform.dense.weight")))
            set_path(params, "transform_dense/bias", sd.pop("cls.predictions.transform.dense.bias"))
            set_path(params, "transform_layer_norm/weight", sd.pop("cls.predictions.transform.layer_norm.weight"))
            set_path(params, "transform_layer_norm/bias", sd.pop("cls.predictions.transform.layer_norm.bias"))
        if "cls.predictions.decoder.bias" in sd:
            params["decoder_bias"] = sd.pop("cls.predictions.decoder.bias")
        sd.pop("cls.predictions.decoder.weight", None)  # tied
    elif head == "classification":
        if "classifier.weight" in sd:
            set_path(params, "classifier/kernel", _t(sd.pop("classifier.weight")))
            set_path(params, "classifier/bias", sd.pop("classifier.bias"))
    return {"params": params}


def flax_to_bert_state_dict(params: dict, config: TrunkConfig) -> Dict[str, Array]:
    """Inverse remap for HF export (reference bert.py:260-366). Takes the
    trunk params of NomicBertModel; emits vanilla HF BERT naming."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, Array] = {}
    emb = p["embeddings"]
    sd["bert.embeddings.word_embeddings.weight"] = np.asarray(emb["word_embeddings"]["embedding"])
    if "position_embeddings" in emb:
        sd["bert.embeddings.position_embeddings.weight"] = np.asarray(
            emb["position_embeddings"]["embedding"]
        )
    if "token_type_embeddings" in emb:
        sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
            emb["token_type_embeddings"]["embedding"]
        )
    sd["bert.embeddings.LayerNorm.weight"] = np.asarray(p["emb_ln"]["weight"])
    sd["bert.embeddings.LayerNorm.bias"] = np.asarray(p["emb_ln"]["bias"])

    for i in range(config.n_layer):
        lp = p[f"layers_{i}"]
        pre = f"bert.encoder.layer.{i}"
        wqkv = _t(np.asarray(lp["attn"]["Wqkv"]["kernel"]))  # [3D, D]
        d3 = wqkv.shape[0] // 3
        sd[f"{pre}.attention.self.query.weight"] = wqkv[:d3]
        sd[f"{pre}.attention.self.key.weight"] = wqkv[d3 : 2 * d3]
        sd[f"{pre}.attention.self.value.weight"] = wqkv[2 * d3 :]
        if "bias" in lp["attn"]["Wqkv"]:
            b = np.asarray(lp["attn"]["Wqkv"]["bias"])
            sd[f"{pre}.attention.self.query.bias"] = b[:d3]
            sd[f"{pre}.attention.self.key.bias"] = b[d3 : 2 * d3]
            sd[f"{pre}.attention.self.value.bias"] = b[2 * d3 :]
        sd[f"{pre}.attention.output.dense.weight"] = _t(np.asarray(lp["attn"]["out_proj"]["kernel"]))
        if "bias" in lp["attn"]["out_proj"]:
            sd[f"{pre}.attention.output.dense.bias"] = np.asarray(lp["attn"]["out_proj"]["bias"])
        sd[f"{pre}.attention.output.LayerNorm.weight"] = np.asarray(lp["norm1"]["weight"])
        sd[f"{pre}.attention.output.LayerNorm.bias"] = np.asarray(lp["norm1"]["bias"])
        sd[f"{pre}.output.LayerNorm.weight"] = np.asarray(lp["norm2"]["weight"])
        sd[f"{pre}.output.LayerNorm.bias"] = np.asarray(lp["norm2"]["bias"])
        if "fc1" in lp["mlp"]:
            sd[f"{pre}.intermediate.dense.weight"] = _t(np.asarray(lp["mlp"]["fc1"]["kernel"]))
            if "bias" in lp["mlp"]["fc1"]:
                sd[f"{pre}.intermediate.dense.bias"] = np.asarray(lp["mlp"]["fc1"]["bias"])
            sd[f"{pre}.output.dense.weight"] = _t(np.asarray(lp["mlp"]["fc2"]["kernel"]))
            if "bias" in lp["mlp"]["fc2"]:
                sd[f"{pre}.output.dense.bias"] = np.asarray(lp["mlp"]["fc2"]["bias"])
        else:  # flash gated layout round-trips as-is
            for fc in ("fc11", "fc12", "fc2"):
                sd[f"bert.encoder.layer.{i}.mlp.{fc}.weight"] = _t(np.asarray(lp["mlp"][fc]["kernel"]))
                if "bias" in lp["mlp"][fc]:
                    sd[f"bert.encoder.layer.{i}.mlp.{fc}.bias"] = np.asarray(lp["mlp"][fc]["bias"])
    if "pooler_dense" in p:
        sd["bert.pooler.dense.weight"] = _t(np.asarray(p["pooler_dense"]["kernel"]))
        sd["bert.pooler.dense.bias"] = np.asarray(p["pooler_dense"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# ModernBERT (answerdotai/ModernBERT-*): prenorm, alternating global/local
# attention, GeGLU with fused Wi. The reference ships modernbert recipes but
# no model code (its configs/train/*_modernbert.yaml would not load) — this
# framework actually runs them.
# ---------------------------------------------------------------------------


def modernbert_config_to_trunk_config(hf: Dict, **overrides) -> TrunkConfig:
    kw = dict(
        vocab_size=hf["vocab_size"],
        n_positions=0,  # rotary
        n_embd=hf["hidden_size"],
        n_layer=hf["num_hidden_layers"],
        n_head=hf["num_attention_heads"],
        n_inner=hf["intermediate_size"],
        activation_function="geglu",  # act(input) * gate, exact gelu
        layer_norm_epsilon=hf.get("norm_eps", 1e-5),
        norm_bias=bool(hf.get("norm_bias", False)),
        prenorm=True,
        skip_first_prenorm=True,  # layer 0 attn_norm is Identity
        causal=False,
        rotary_emb_fraction=1.0,
        rotary_emb_base=hf.get("global_rope_theta", 160_000.0),
        local_rotary_emb_base=hf.get("local_rope_theta", 10_000.0),
        sliding_window=hf.get("local_attention", 128),
        global_attn_every_n_layers=hf.get("global_attn_every_n_layers", 3),
        qkv_proj_bias=bool(hf.get("attention_bias", False)),
        mlp_fc1_bias=bool(hf.get("mlp_bias", False)),
        mlp_fc2_bias=bool(hf.get("mlp_bias", False)),
        type_vocab_size=0,
        pad_token_id=hf.get("pad_token_id", 0),
        embd_pdrop=hf.get("embedding_dropout", 0.0),
        resid_pdrop=hf.get("mlp_dropout", 0.0),
        attn_pdrop=hf.get("attention_dropout", 0.0),
        max_trained_positions=hf.get("max_position_embeddings", 8192),
    )
    kw.update(overrides)
    return TrunkConfig(**kw)


def modernbert_state_dict_to_flax(sd: Dict[str, Array], config: TrunkConfig) -> dict:
    """HF ModernBertModel state dict -> NomicBertModel flax params.
    Wi packs [input, gate]; HF computes act(input) * gate, our GatedMLP
    computes fc11(x) * act(fc12(x)) — so fc12 <- input half, fc11 <- gate."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    trunk: dict = {}
    w = sd["embeddings.tok_embeddings.weight"]
    if config.vocab_size > w.shape[0]:
        w = np.pad(w, ((0, config.vocab_size - w.shape[0]), (0, 0)))
    set_path(trunk, "embeddings/word_embeddings/embedding", w)
    set_path(trunk, "emb_ln/weight", sd["embeddings.norm.weight"])
    if "embeddings.norm.bias" in sd:
        set_path(trunk, "emb_ln/bias", sd["embeddings.norm.bias"])
    for i in range(config.n_layer):
        src = f"layers.{i}"
        dst = f"layers_{i}"
        set_path(trunk, f"{dst}/attn/Wqkv/kernel", _t(sd[f"{src}.attn.Wqkv.weight"]))
        set_path(trunk, f"{dst}/attn/out_proj/kernel", _t(sd[f"{src}.attn.Wo.weight"]))
        if f"{src}.attn_norm.weight" in sd:  # absent at layer 0 (Identity)
            set_path(trunk, f"{dst}/norm1/weight", sd[f"{src}.attn_norm.weight"])
            if f"{src}.attn_norm.bias" in sd:
                set_path(trunk, f"{dst}/norm1/bias", sd[f"{src}.attn_norm.bias"])
        set_path(trunk, f"{dst}/norm2/weight", sd[f"{src}.mlp_norm.weight"])
        if f"{src}.mlp_norm.bias" in sd:
            set_path(trunk, f"{dst}/norm2/bias", sd[f"{src}.mlp_norm.bias"])
        wi = sd[f"{src}.mlp.Wi.weight"]  # [2F, E] torch layout
        F_hid = wi.shape[0] // 2
        set_path(trunk, f"{dst}/mlp/fc12/kernel", _t(wi[:F_hid]))  # acted "input"
        set_path(trunk, f"{dst}/mlp/fc11/kernel", _t(wi[F_hid:]))  # linear "gate"
        set_path(trunk, f"{dst}/mlp/fc2/kernel", _t(sd[f"{src}.mlp.Wo.weight"]))
    set_path(trunk, "final_norm/weight", sd["final_norm.weight"])
    if "final_norm.bias" in sd:
        set_path(trunk, "final_norm/bias", sd["final_norm.bias"])
    return {"params": trunk}


def flax_to_nomic_state_dict(params: dict, config: TrunkConfig) -> Dict[str, Array]:
    """Inverse remap keeping the flash naming (Wqkv fused, fc11/fc12,
    norm1/norm2) — the layout the exported trust_remote_code torch model
    (models/modeling_nomic_bert_hf.py) loads with strict=True, and which
    normalize_bert_keys() re-imports. Counterpart of the reference's hub
    checkpoints for nomic-bert-2048 (reference
    models/huggingface/modeling_hf_nomic_bert.py state-dict layout)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, Array] = {}
    emb = p["embeddings"]
    sd["embeddings.word_embeddings.weight"] = np.asarray(emb["word_embeddings"]["embedding"])
    if "position_embeddings" in emb:
        sd["embeddings.position_embeddings.weight"] = np.asarray(
            emb["position_embeddings"]["embedding"]
        )
    if "token_type_embeddings" in emb:
        sd["embeddings.token_type_embeddings.weight"] = np.asarray(
            emb["token_type_embeddings"]["embedding"]
        )
    sd["emb_ln.weight"] = np.asarray(p["emb_ln"]["weight"])
    if "bias" in p["emb_ln"]:
        sd["emb_ln.bias"] = np.asarray(p["emb_ln"]["bias"])

    for i in range(config.n_layer):
        lp = p[f"layers_{i}"]
        pre = f"encoder.layers.{i}"
        sd[f"{pre}.attn.Wqkv.weight"] = _t(np.asarray(lp["attn"]["Wqkv"]["kernel"]))
        if "bias" in lp["attn"]["Wqkv"]:
            sd[f"{pre}.attn.Wqkv.bias"] = np.asarray(lp["attn"]["Wqkv"]["bias"])
        sd[f"{pre}.attn.out_proj.weight"] = _t(np.asarray(lp["attn"]["out_proj"]["kernel"]))
        if "bias" in lp["attn"]["out_proj"]:
            sd[f"{pre}.attn.out_proj.bias"] = np.asarray(lp["attn"]["out_proj"]["bias"])
        for norm in ("norm1", "norm2"):
            if norm not in lp:  # prenorm layer 0 may skip norm1 (ModernBERT)
                continue
            sd[f"{pre}.{norm}.weight"] = np.asarray(lp[norm]["weight"])
            if "bias" in lp[norm]:
                sd[f"{pre}.{norm}.bias"] = np.asarray(lp[norm]["bias"])
        for fc in ("fc1", "fc2", "fc11", "fc12"):
            if fc in lp["mlp"]:
                sd[f"{pre}.mlp.{fc}.weight"] = _t(np.asarray(lp["mlp"][fc]["kernel"]))
                if "bias" in lp["mlp"][fc]:
                    sd[f"{pre}.mlp.{fc}.bias"] = np.asarray(lp["mlp"][fc]["bias"])
    if "final_norm" in p:  # prenorm trunks
        sd["final_norm.weight"] = np.asarray(p["final_norm"]["weight"])
        if "bias" in p["final_norm"]:
            sd["final_norm.bias"] = np.asarray(p["final_norm"]["bias"])
    return sd


def torch_state_dict_to_numpy(sd) -> Dict[str, Array]:
    return {k: v.detach().cpu().float().numpy() for k, v in sd.items()}
