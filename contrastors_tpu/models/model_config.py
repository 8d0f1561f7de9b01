"""Architecture config shared by every trunk (encoder / decoder / ViT).

This is the TPU-side analogue of the reference's GPT2Config-based
NomicBertConfig (reference: models/encoder/configuration_nomic_bert.py and
the converter functions in models/encoder/bert.py:11-50,
models/decoder/*.py, models/vit/*.py). One flat dataclass covers all model
families; family-specific fields default to "off".
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

ACTIVATIONS = (
    "gelu",
    "gelu_new",
    "gelu_fast",
    "gelu_pytorch_tanh",
    "quick_gelu",
    "swiglu",
    "geglu",
    "glu",
    "silu",
    "relu",
)


@dataclass
class TrunkConfig:
    # core transformer shape
    vocab_size: int = 30528
    n_positions: int = 2048
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None  # default 4*n_embd
    num_heads_kv: Optional[int] = None  # GQA/MQA; default n_head
    activation_function: str = "gelu"

    # dropouts
    resid_pdrop: float = 0.0
    embd_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    moe_resid_pdrop: Optional[float] = None

    layer_norm_epsilon: float = 1e-12
    initializer_range: float = 0.02
    use_rms_norm: bool = False
    # keep the residual stream in fp32 under bf16 compute
    residual_in_fp32: bool = True

    # block structure
    prenorm: bool = False
    parallel_block: bool = False
    parallel_block_tied_norm: bool = False
    causal: bool = False
    layer_scale: bool = False
    layer_scale_init: float = 1e-5
    drop_path_rate: float = 0.0
    norm_mlp: bool = False  # EVA: LN after gated-MLP activation
    prepre_layernorm: bool = False  # CLIP ViT ln_pre
    no_last_ln: bool = False  # EVA02: no final LN on the residual stream
    ln_f_bias: bool = True  # open_lm final-LN quirk

    # rotary embeddings
    rotary_emb_fraction: float = 0.0
    rotary_emb_base: float = 10_000.0
    # ModernBERT-style alternating local/global attention: sliding_window is
    # the TOTAL window (attend iff |i-j| <= window // 2, HF local_attention
    # semantics); every global_attn_every_n_layers-th layer is global
    # (0 = all layers global); local layers may use a different rotary base.
    sliding_window: int = 0
    global_attn_every_n_layers: int = 0
    local_rotary_emb_base: Optional[float] = None
    # prenorm trunks: skip norm1 in layer 0 (ModernBERT — the embedding
    # norm directly precedes it)
    skip_first_prenorm: bool = False
    norm_bias: bool = True
    rotary_emb_interleaved: bool = False
    rotary_emb_scale_base: Optional[float] = None  # xpos; unused by released ckpts
    rotary_scaling_factor: Optional[float] = None  # DynamicNTK (inference only)
    max_trained_positions: int = 2048
    rope_scaling: Optional[Dict[str, Any]] = None  # llama3 frequency-band smoothing
    # open_lm quirk: rotary applied over the HEAD index instead of the
    # sequence position (upstream xformers accident the reference preserves,
    # reference layers/attention.py:78-80,126-131)
    rotary_head_dim: bool = False

    # biases
    qkv_proj_bias: bool = True
    mlp_fc1_bias: bool = True
    mlp_fc2_bias: bool = True

    # embeddings (encoder)
    type_vocab_size: int = 0
    pad_token_id: Optional[int] = None
    pad_vocab_size_multiple: int = 1

    # MLM head details. dense_seq_output mirrors the reference default
    # (configuration_nomic_bert.py:26): project only masked rows through
    # the vocab head (host-collated static-count positions on TPU).
    dense_seq_output: bool = True
    tie_word_embeddings: bool = True
    num_labels: int = 2
    classifier_dropout: Optional[float] = None
    problem_type: Optional[str] = None

    # MoE
    num_experts: int = 0
    moe_top_k: int = 1
    moe_every_n_layers: int = 1
    # "dropless": sort-by-expert + ragged grouped matmul, no token drops
    # (megablocks dMoE semantics); "capacity": fixed-capacity scatter/gather
    # dispatch (Switch-style, can drop under extreme imbalance)
    moe_impl: str = "dropless"
    moe_capacity_factor: float = 2.0  # capacity impl: slots = cf * N * k / E
    moe_block_m: int = 128  # dropless impl: group-alignment / gmm row block
    ffn_div: int = 1
    moe_normalize_expert_weights: bool = False
    expert_choice_router: bool = False
    num_shared_experts: int = 0
    router_aux_loss_coef: float = 0.001

    # ViT
    img_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    patch_embed_bias: bool = True
    learned_pos_embedding: bool = False
    sinusoidal_pos_embedding: bool = False
    use_pos_embed: bool = True
    no_embed_class: bool = False
    no_cls_token: bool = False
    register_tokens: int = 0
    mask_token: bool = False
    patch_dropout: float = 0.0
    use_rotary_pos_emb: bool = False  # 2-D rope (EVA02)
    ref_feat_shape: Optional[Tuple[int, int]] = None
    global_pool: Optional[str] = None  # "avg" => EVA-style mean over patches, no final LN

    # kernel selection (TPU-specific; no reference counterpart)
    attn_impl: str = "sdpa"  # "sdpa" | "flash"
    flash_block_q: int = 512
    flash_block_kv: int = 2048
    # rotate q/k in-VMEM inside the Pallas flash kernels instead of an
    # outside apply_rotary (the reference's CUDA kernels fuse rotary,
    # layers/embedding.py:618-745). Numerically identical; OFF by default
    # because on v5e at D=64 the in-kernel re-rotation's extra MXU work
    # exceeds the ~one-HBM-round-trip it saves (measured 0.91x fwd at the
    # MLM geometry — see ROADMAP round-4 rotary-fusion ablation). Flip on
    # for hardware/geometries where attention is bandwidth-bound.
    fused_rotary: bool = False

    def __post_init__(self):
        if self.n_inner is None:
            self.n_inner = 4 * self.n_embd
        if self.num_heads_kv is None:
            self.num_heads_kv = self.n_head
        if self.activation_function not in ACTIVATIONS:
            raise ValueError(f"unknown activation {self.activation_function!r}")
        if self.n_embd % self.n_head != 0:
            raise ValueError("n_embd must be divisible by n_head")
        if self.vocab_size % self.pad_vocab_size_multiple != 0:
            self.vocab_size += self.pad_vocab_size_multiple - (
                self.vocab_size % self.pad_vocab_size_multiple
            )

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def rotary_emb_dim(self) -> int:
        return int(self.head_dim * self.rotary_emb_fraction)

    def replace(self, **kw) -> "TrunkConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "TrunkConfig":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        if d.get("ref_feat_shape") is not None:
            d["ref_feat_shape"] = tuple(d["ref_feat_shape"])
        return cls(**{k: v for k, v in d.items() if k in known})
