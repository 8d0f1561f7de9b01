"""Self-contained pure-torch NomicBERT for HuggingFace export.

This file is copied verbatim into every exported checkpoint directory as
`modeling_nomic_bert.py` so the flagship rotary+swiglu trunk loads in plain
`transformers` via trust_remote_code — the role the reference fills with its
hub-side model (reference: models/huggingface/modeling_hf_nomic_bert.py:
1102-1416, python rotary + SDPA + non-fused gated MLP). Original
implementation: it mirrors the *flax* modules in this repo
(layers/attention.py, layers/mlp.py, layers/block.py, models/nomic_bert.py)
operation-for-operation, and uses their flash-style parameter naming
(Wqkv, fc11/fc12, norm1/norm2) so the exported safetensors load with
`strict=True` and also re-import through hf_interop.normalize_bert_keys.

Must stay dependency-light: torch + transformers only.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from transformers import PretrainedConfig, PreTrainedModel
from transformers.modeling_outputs import BaseModelOutput, MaskedLMOutput


class NomicBertConfig(PretrainedConfig):
    model_type = "nomic_bert"

    def __init__(
        self,
        vocab_size=30528,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        hidden_act="swiglu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=0,
        type_vocab_size=2,
        initializer_range=0.02,
        layer_norm_eps=1e-12,
        pad_token_id=0,
        rotary_emb_fraction=1.0,
        rotary_emb_base=1000.0,
        rotary_emb_interleaved=False,
        max_trained_positions=2048,
        qkv_proj_bias=False,
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        use_rms_norm=False,
        norm_bias=True,
        prenorm=False,
        skip_first_prenorm=False,
        sliding_window=0,
        global_attn_every_n_layers=0,
        local_rope_theta=None,
        tie_word_embeddings=True,
        **kwargs,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.rotary_emb_fraction = rotary_emb_fraction
        self.rotary_emb_base = rotary_emb_base
        self.rotary_emb_interleaved = rotary_emb_interleaved
        self.max_trained_positions = max_trained_positions
        self.qkv_proj_bias = qkv_proj_bias
        self.mlp_fc1_bias = mlp_fc1_bias
        self.mlp_fc2_bias = mlp_fc2_bias
        self.use_rms_norm = use_rms_norm
        self.norm_bias = norm_bias
        self.prenorm = prenorm
        self.skip_first_prenorm = skip_first_prenorm
        self.sliding_window = sliding_window
        self.global_attn_every_n_layers = global_attn_every_n_layers
        self.local_rope_theta = local_rope_theta
        super().__init__(pad_token_id=pad_token_id, tie_word_embeddings=tie_word_embeddings, **kwargs)


GATED_ACTS = {"swiglu": F.silu, "glu": torch.sigmoid, "geglu": F.gelu}


def _act(name):
    if name in ("gelu", "gelu_new", "gelu_python", "gelu_pytorch_tanh"):
        return lambda x: F.gelu(x, approximate="tanh" if "tanh" in name or name == "gelu_new" else "none")
    if name == "quick_gelu":
        return lambda x: x * torch.sigmoid(1.702 * x)
    if name == "relu":
        return F.relu
    if name in GATED_ACTS:
        return GATED_ACTS[name]
    return getattr(F, name)


def _make_norm(config, dim=None):
    dim = dim or config.hidden_size
    if config.use_rms_norm:
        return nn.RMSNorm(dim, eps=config.layer_norm_eps)
    return nn.LayerNorm(dim, eps=config.layer_norm_eps, bias=getattr(config, "norm_bias", True))


def _rotary_cos_sin(seqlen, rotary_dim, base, device):
    inv_freq = 1.0 / (
        base ** (torch.arange(0, rotary_dim, 2, dtype=torch.float32, device=device) / rotary_dim)
    )
    t = torch.arange(seqlen, dtype=torch.float32, device=device)
    freqs = torch.outer(t, inv_freq)  # [S, rot/2]
    return freqs.cos(), freqs.sin()


def _apply_rotary(x, cos, sin, interleaved=False):
    """x: [B, S, H, D]; cos/sin: [S, rot/2] fp32. Matches
    contrastors_tpu.layers.rotary.apply_rotary (non-varlen path)."""
    rot_dim = cos.shape[-1] * 2
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    x_rot = x[..., :rot_dim].float()
    x_pass = x[..., rot_dim:]
    if interleaved:
        x1, x2 = x_rot[..., ::2], x_rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        rotated = torch.stack([o1, o2], dim=-1).reshape(x_rot.shape)
    else:
        half = rot_dim // 2
        x1, x2 = x_rot[..., :half], x_rot[..., half:]
        rotated = torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)
    rotated = rotated.to(x.dtype)
    if x_pass.shape[-1] == 0:
        return rotated
    return torch.cat([rotated, x_pass], dim=-1)


class NomicBertEmbeddings(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.word_embeddings = nn.Embedding(config.vocab_size, config.hidden_size)
        self.use_abs_pos = config.max_position_embeddings > 0 and config.rotary_emb_fraction <= 0
        if self.use_abs_pos:
            self.position_embeddings = nn.Embedding(config.max_position_embeddings, config.hidden_size)
        if config.type_vocab_size > 0:
            self.token_type_embeddings = nn.Embedding(config.type_vocab_size, config.hidden_size)
        self.type_vocab_size = config.type_vocab_size
        self.pad_token_id = config.pad_token_id

    def forward(self, input_ids, position_ids=None, token_type_ids=None):
        emb = self.word_embeddings(input_ids)
        if self.use_abs_pos:
            if position_ids is None:
                if self.pad_token_id is not None and self.pad_token_id > 0:
                    # XLM-R style pad-aware positions (cumsum over non-pad)
                    mask = (input_ids != self.pad_token_id).long()
                    position_ids = torch.cumsum(mask, dim=1) * mask + self.pad_token_id
                else:
                    position_ids = torch.arange(input_ids.shape[1], device=input_ids.device)[None]
            emb = emb + self.position_embeddings(position_ids)
        if self.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = torch.zeros_like(input_ids)
            emb = emb + self.token_type_embeddings(token_type_ids)
        return emb


class NomicBertAttention(nn.Module):
    def __init__(self, config, rotary_base=None, window=0):
        super().__init__()
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.rotary_dim = int(self.head_dim * config.rotary_emb_fraction)
        self.rotary_base = rotary_base or config.rotary_emb_base
        self.window = window  # total sliding window; attend iff |i-j| <= window // 2
        self.interleaved = config.rotary_emb_interleaved
        self.Wqkv = nn.Linear(config.hidden_size, 3 * config.hidden_size, bias=config.qkv_proj_bias)
        self.out_proj = nn.Linear(config.hidden_size, config.hidden_size, bias=config.qkv_proj_bias)
        self.dropout_p = config.attention_probs_dropout_prob

    def forward(self, hidden_states, attn_bias=None):
        B, S, _ = hidden_states.shape
        qkv = self.Wqkv(hidden_states).reshape(B, S, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.unbind(dim=2)  # each [B, S, H, D]
        if self.rotary_dim > 0:
            cos, sin = _rotary_cos_sin(S, self.rotary_dim, self.rotary_base, hidden_states.device)
            q = _apply_rotary(q, cos, sin, self.interleaved)
            k = _apply_rotary(k, cos, sin, self.interleaved)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # [B, H, S, D]
        if self.window > 0:
            pos = torch.arange(S, device=hidden_states.device)
            band = (pos[None, :] - pos[:, None]).abs() <= self.window // 2
            wbias = torch.zeros(S, S, dtype=q.dtype, device=q.device)
            wbias.masked_fill_(~band, torch.finfo(q.dtype).min)
            attn_bias = wbias if attn_bias is None else attn_bias + wbias
        out = F.scaled_dot_product_attention(
            q, k, v, attn_mask=attn_bias, dropout_p=self.dropout_p if self.training else 0.0
        )
        out = out.transpose(1, 2).reshape(B, S, -1)
        return self.out_proj(out)


class NomicBertGatedMLP(nn.Module):
    """out = fc2( fc11(x) * act(fc12(x)) ) — act on the fc12 gate branch,
    matching layers/mlp.py GatedMLP."""

    def __init__(self, config):
        super().__init__()
        hidden = config.intermediate_size
        self.fc11 = nn.Linear(config.hidden_size, hidden, bias=config.mlp_fc1_bias)
        self.fc12 = nn.Linear(config.hidden_size, hidden, bias=config.mlp_fc1_bias)
        self.fc2 = nn.Linear(hidden, config.hidden_size, bias=config.mlp_fc2_bias)
        self.act = _act(config.hidden_act)

    def forward(self, x):
        return self.fc2(self.fc11(x) * self.act(self.fc12(x)))


class NomicBertMLP(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.fc1 = nn.Linear(config.hidden_size, config.intermediate_size, bias=config.mlp_fc1_bias)
        self.fc2 = nn.Linear(config.intermediate_size, config.hidden_size, bias=config.mlp_fc2_bias)
        self.act = _act(config.hidden_act)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class NomicBertBlock(nn.Module):
    """Post-norm: h = norm1(attn(h) + h); h = norm2(mlp(h) + h), or
    pre-norm: h = h + attn(norm1(h)); h = h + mlp(norm2(h))
    (matches layers/block.py). Pre-norm layer 0 may skip norm1
    (ModernBERT). Local layers get a sliding window + their own rotary
    base."""

    def __init__(self, config, layer_idx=0):
        super().__init__()
        every_n = getattr(config, "global_attn_every_n_layers", 0)
        is_global = every_n <= 0 or layer_idx % every_n == 0
        self.prenorm = bool(getattr(config, "prenorm", False))
        self.attn = NomicBertAttention(
            config,
            rotary_base=None if is_global else getattr(config, "local_rope_theta", None),
            window=0 if is_global else getattr(config, "sliding_window", 0),
        )
        self.mlp = NomicBertGatedMLP(config) if config.hidden_act in GATED_ACTS else NomicBertMLP(config)
        skip_norm1 = (
            self.prenorm and getattr(config, "skip_first_prenorm", False) and layer_idx == 0
        )
        self.norm1 = nn.Identity() if skip_norm1 else _make_norm(config)
        self.norm2 = _make_norm(config)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, hidden_states, attn_bias=None):
        if self.prenorm:
            hidden_states = hidden_states + self.dropout(
                self.attn(self.norm1(hidden_states), attn_bias=attn_bias)
            )
            return hidden_states + self.dropout(self.mlp(self.norm2(hidden_states)))
        attn_out = self.attn(hidden_states, attn_bias=attn_bias)
        hidden_states = self.norm1(self.dropout(attn_out) + hidden_states)
        mlp_out = self.mlp(hidden_states)
        return self.norm2(self.dropout(mlp_out) + hidden_states)


class NomicBertPreTrainedModel(PreTrainedModel):
    config_class = NomicBertConfig
    base_model_prefix = "model"
    supports_gradient_checkpointing = False

    def _init_weights(self, module):
        std = self.config.initializer_range
        if isinstance(module, nn.Linear):
            module.weight.data.normal_(mean=0.0, std=std)
            if module.bias is not None:
                module.bias.data.zero_()
        elif isinstance(module, nn.Embedding):
            module.weight.data.normal_(mean=0.0, std=std)
        elif isinstance(module, nn.LayerNorm):
            if module.bias is not None:
                module.bias.data.zero_()
            module.weight.data.fill_(1.0)


class NomicBertEncoder(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.layers = nn.ModuleList(
            NomicBertBlock(config, layer_idx=i) for i in range(config.num_hidden_layers)
        )

    def forward(self, hidden_states, attn_bias=None):
        for layer in self.layers:
            hidden_states = layer(hidden_states, attn_bias=attn_bias)
        return hidden_states


class NomicBertModel(NomicBertPreTrainedModel):
    def __init__(self, config):
        super().__init__(config)
        self.embeddings = NomicBertEmbeddings(config)
        self.emb_ln = _make_norm(config)
        self.emb_drop = nn.Dropout(config.hidden_dropout_prob)
        self.encoder = NomicBertEncoder(config)
        self.final_norm = _make_norm(config) if getattr(config, "prenorm", False) else None
        self.post_init()

    def forward(
        self,
        input_ids,
        attention_mask=None,
        position_ids=None,
        token_type_ids=None,
        return_dict=True,
        **kwargs,
    ):
        hidden = self.embeddings(input_ids, position_ids=position_ids, token_type_ids=token_type_ids)
        hidden = self.emb_drop(self.emb_ln(hidden))
        attn_bias = None
        if attention_mask is not None:
            # additive bias [B, 1, 1, S]: 0 keep / -inf drop
            neg = torch.finfo(hidden.dtype).min
            attn_bias = (1.0 - attention_mask[:, None, None, :].to(hidden.dtype)) * neg
        hidden = self.encoder(hidden, attn_bias=attn_bias)
        if self.final_norm is not None:
            hidden = self.final_norm(hidden)
        if not return_dict:
            return (hidden,)
        return BaseModelOutput(last_hidden_state=hidden)


class NomicBertForMaskedLM(NomicBertPreTrainedModel):
    _tied_weights_keys = ["decoder.weight"]

    def __init__(self, config):
        super().__init__(config)
        self.model = NomicBertModel(config)
        self.transform_dense = nn.Linear(config.hidden_size, config.hidden_size, bias=config.mlp_fc1_bias)
        act_name = config.hidden_act
        self.transform_act = F.silu if act_name in GATED_ACTS else _act(act_name)
        self.transform_layer_norm = _make_norm(config)
        self.decoder = nn.Linear(config.hidden_size, config.vocab_size, bias=True)
        self.post_init()
        if config.tie_word_embeddings:
            self.decoder.weight = self.model.embeddings.word_embeddings.weight

    def get_output_embeddings(self):
        return self.decoder

    def forward(self, input_ids, attention_mask=None, token_type_ids=None, labels=None, **kwargs):
        hidden = self.model(
            input_ids, attention_mask=attention_mask, token_type_ids=token_type_ids
        ).last_hidden_state
        h = self.transform_layer_norm(self.transform_act(self.transform_dense(hidden)))
        logits = self.decoder(h)
        loss = None
        if labels is not None:
            loss = F.cross_entropy(logits.view(-1, logits.shape[-1]), labels.view(-1), ignore_index=-100)
        return MaskedLMOutput(loss=loss, logits=logits)
