"""Typed run-configuration schema.

Field names are kept compatible with the reference trainer configs
(/root/reference/src/contrastors/config.py:8-241) so that existing YAML
recipes parse unchanged, while adding TPU-specific knobs (mesh shape,
attention kernel implementation, prefetch depth) that have no CUDA
counterpart.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

from pydantic import BaseModel, ConfigDict, field_validator, model_validator

# OpenCLIP / OpenAI CLIP normalization constants (reference:
# dataset/constants.py OPENAI_IMAGE_DATASET_MEAN/STD).
OPENAI_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

_DISTILL_LOSSES = ("mse", "kd", "towers", "stella")
_POOLINGS = ("mean", "last", "cls", "map", "none")
# Mirrors TRAINER_REGISTRY (trainers/__init__.py); reference set at
# trainers/__init__.py:9-17 ("clip" = unlocked CLIP training).
_MODEL_TYPES = ("encoder", "mlm", "glue", "clip", "locked_text", "mmlm", "distill")


class _Base(BaseModel):
    # Ignore unknown keys so that reference YAMLs with fields we deliberately
    # dropped (e.g. use_fp8, deepspeed) still parse.
    model_config = ConfigDict(extra="ignore", validate_assignment=True)


class TrainArgs(_Base):
    num_epochs: int = 1
    num_train_steps: Optional[int] = None
    learning_rate: float
    weight_decay: float = 0.0
    eps: float = 1e-8
    warmup_steps: Optional[int] = None
    warmup_pct: Optional[float] = None
    cooldown_steps: Optional[int] = None
    checkpoint: Optional[str] = None
    wandb: bool = False
    wandb_project_name: Optional[str] = None
    wandb_entity: Optional[str] = None
    wandb_run_name: Optional[str] = None
    wandb_group: Optional[str] = None
    log_grads_every: int = 100
    log_lr_every: int = 10
    save_every: Optional[int] = None
    # orbax async saves: disk write overlaps training (single-process only;
    # multihost always uses the sync path). See trainers/base.py.
    async_checkpointing: bool = True
    eval_steps: Optional[int] = None
    eval_strategy: Optional[str] = None
    output_dir: Optional[str] = None
    gradient_accumulation_steps: int = 1
    schedule_type: str = "linear"
    max_grad_norm: float = 1.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    loss_fn: Optional[str] = None
    grad_cache: Optional[bool] = None
    chunk_size: Optional[int] = None
    # TPU extension: hybrid GradCache — leading chunks of each tower keep
    # live activations (jax.vjp) and skip the pass-2 re-forward (6*P*T
    # instead of 8*P*T for that fraction). Bounded by HBM: on 16 GB v5e
    # the 137M flagship fits all query chunks (+3% step) but no 256-token
    # document chunks; on v5p there is room for documents too.
    grad_cache_direct_chunks_q: int = 0
    grad_cache_direct_chunks_d: int = 0
    # TPU extension: pass-1 super-chunking — embed m pass-2-sized chunks
    # per launch (vmapped, per-sub-chunk RNG keys so dropout replay stays
    # exact for stochastic encoders). Measured a NET LOSS on v5e at both
    # flagship geometries (headline 477 -> 430 pairs/s at m=4; vision
    # 900 -> 1031 ms — pass 1 is not launch-bound there, see ROADMAP);
    # keep 1 unless a profile on other hardware shows otherwise.
    grad_cache_embed_parallel: int = 1
    clamp_logits: bool = True
    logit_max: float = 100.0
    add_l2_loss: bool = False
    matryoshka_dims: Optional[List[int]] = None
    matryoshka_loss_weights: Optional[List[float]] = None
    profile: bool = False
    router_aux_loss_coef: float = 0.001
    distill_loss_fn: str = "mse"
    distill_temperature: float = 1.0
    seed: Optional[int] = None

    @field_validator("logit_max", mode="before")
    @classmethod
    def _default_logit_max(cls, v):
        return 100.0 if v is None else v

    @field_validator("eval_strategy")
    @classmethod
    def _check_eval_strategy(cls, v):
        if v is not None and v not in ("steps", "epochs"):
            raise ValueError(f"unknown eval_strategy {v!r}; expected 'steps' or 'epochs'")
        return v

    @field_validator("distill_loss_fn")
    @classmethod
    def _check_distill(cls, v):
        if v not in _DISTILL_LOSSES:
            raise ValueError(f"unknown distill_loss_fn {v!r}; expected one of {_DISTILL_LOSSES}")
        return v

    @model_validator(mode="after")
    def _cross_checks(self):
        if self.eval_strategy == "steps" and self.eval_steps is None:
            raise ValueError("eval_steps is required when eval_strategy='steps'")
        if self.matryoshka_dims is not None and self.grad_cache:
            raise ValueError("matryoshka_dims cannot be combined with grad_cache")
        if (
            self.matryoshka_dims is not None
            and self.matryoshka_loss_weights is not None
            and len(self.matryoshka_loss_weights) != len(self.matryoshka_dims)
        ):
            # zip() in the loss would silently truncate one list while
            # sum(weights) used the other — a silently wrong objective
            raise ValueError(
                f"matryoshka_loss_weights has {len(self.matryoshka_loss_weights)} "
                f"entries for {len(self.matryoshka_dims)} matryoshka_dims"
            )
        return self


class DataArgs(_Base):
    shuffle: bool = True
    workers: int = 0
    batch_size: int
    seed: int = 42
    val_pct: Optional[float] = None


class MLMDataArgs(DataArgs):
    tokenized_dataset: Optional[str] = None
    mlm_prob: Optional[float] = None
    eval_batch_size: Optional[int] = None
    task_name: Optional[str] = None
    val_mlm_prob: Optional[float] = None
    # mmlm: sample languages by the reference's published per-language corpus
    # sizes (dataset/constants.py:2013) instead of the local corpus sizes —
    # keeps the alpha=0.3 mix recipe-faithful on partial local mirrors.
    sample_by_reference_lengths: bool = False

    @model_validator(mode="after")
    def _checks(self):
        if self.tokenized_dataset is None and self.task_name is None:
            raise ValueError("one of tokenized_dataset / task_name must be set")
        # task_name (GLUE) datasets are not masked; MLM corpora need probs
        if self.tokenized_dataset is not None and self.task_name is None:
            if self.mlm_prob is None or self.val_mlm_prob is None:
                raise ValueError("mlm_prob and val_mlm_prob are required with tokenized_dataset")
        for p in (self.mlm_prob, self.val_mlm_prob):
            if p is not None and not (0.0 <= p <= 1.0):
                raise ValueError("mlm probabilities must be in [0, 1]")
        return self


class ContrastiveDataArgs(DataArgs):
    input_shards: str
    # in-train retrieval eval (NanoBEIR-equivalent, reference
    # trainers/text_text.py:453-471): a local dir with corpus.jsonl
    # ({_id, title?, text}), queries.jsonl ({_id, text}) and qrels.tsv
    # (query-id \t corpus-id \t score)
    eval_retrieval: Optional[str] = None
    # encode batch for the in-train retrieval eval (clamped up to the data
    # axis size so the SPMD encode covers the mesh)
    eval_batch_size: Optional[int] = None
    download: bool = False
    process_one_shard: bool = False
    streaming: bool = True
    weighted_sampling: bool = False
    verbose: bool = False
    seq_len: Optional[int] = None
    sample_negatives: bool = True
    query_max_length: Optional[int] = None
    document_max_length: Optional[int] = None
    # TPU-specific sequence packing (data/packing.py; no reference
    # counterpart — the CUDA stack pads and relies on varlen kernels):
    # pack batch rows of packed_seq_len tokens holding up to
    # packed_max_segments sequences each, attention masked per segment.
    packed: bool = False
    packed_seq_len: Optional[int] = None
    packed_max_segments: int = 4
    # measure the first batch's padded-vs-packed token budgets and disable
    # packing for the run when the predicted gain is below
    # packed_auto_threshold (packing loses at short-doc geometries — 0.68x
    # measured on v5e — because segment bookkeeping costs more than the
    # removed padding)
    packed_auto: bool = False
    packed_auto_threshold: float = 1.15


class ImageTextDataArgs(DataArgs):
    image_text_shards: str
    eval_batch_size: int
    imagenet_val_path: Optional[str] = None
    eval_flickr: bool = False
    # local tar shards of paired image/caption samples for retrieval eval
    flickr_shards: Optional[str] = None
    train_num_samples: Optional[int] = None
    dataset_resampled: bool = False
    mlm_prob: Optional[float] = None


class ModelArgs(_Base):
    model_type: str
    logit_scale: float = 1 / 0.07
    trainable_logit_scale: bool = False
    seq_len: Optional[int] = None
    rotary_emb_fraction: Optional[float] = None
    rotary_emb_base: int = 10_000
    pad_vocab_to_multiple_of: Optional[int] = None
    use_rms_norm: Optional[bool] = None
    pretrained: bool = True
    checkpoint: Optional[str] = None
    model_name: Optional[str] = None
    pooling: Optional[str] = None
    nomic_encoder: bool = False
    add_prefix: bool = False
    num_negatives: int = 7
    tokenizer_name: Optional[str] = None
    activation_function: str = "gelu"
    qkv_proj_bias: bool = True
    mlp_fc1_bias: bool = True
    mlp_fc2_bias: bool = True
    attn_pdrop: float = 0.0
    projection_dim: Optional[int] = None
    freeze: bool = False
    precomputed: bool = False
    gradient_checkpointing: bool = False
    hamming: bool = False
    ema: bool = False
    ema_decay: float = 0.999
    patch_dropout: float = 0.0
    num_experts: int = 0
    moe_top_k: int = 1
    ffn_div: int = 1
    # "dropless" (megablocks-semantics ragged grouped matmul), "capacity"
    # (fixed-capacity dispatch), or "auto" (default): dropless on a single
    # host, capacity under expert parallelism — the dropless ragged layout
    # is data-dependent and GSPMD cannot partition it over "expert" (it
    # all-gathers the expert weights per device), while the capacity
    # einsums shard collective-free. Reference spellings "megablocks" /
    # "contrastors" (block.py:193) are accepted as aliases.
    moe_impl: str = "auto"
    moe_normalize_expert_weights: bool = False
    expert_choice_router: bool = False
    num_shared_experts: int = 0
    resid_pdrop: Optional[float] = None
    moe_every_n_layers: int = 1
    # Optional: reference distill.yaml:43 sets document_prefix null
    # (reference config.py:189-190).
    query_prefix: Optional[str] = "search_query: "
    document_prefix: Optional[str] = "search_document: "
    distill_init_pretrained: bool = False
    # TPU-specific: which attention kernel to lower to.
    attn_impl: str = "flash"  # "flash" (Pallas) | "sdpa" (XLA einsum)

    @model_validator(mode="before")
    @classmethod
    def _alias_top_k(cls, values):
        # Several reference recipes (contrastive_pretrain_tk2.yaml:40,
        # contrastive_pretrain_multilingual.yaml:46) spell the routing knob
        # "top_k"; accept it as an alias so those YAMLs parse unchanged.
        if isinstance(values, dict) and "top_k" in values and "moe_top_k" not in values:
            values = dict(values)
            values["moe_top_k"] = values.pop("top_k")
        return values

    @field_validator("logit_scale", mode="before")
    @classmethod
    def _default_logit_scale(cls, v):
        return 1 / 0.07 if v is None else v

    @field_validator("moe_impl", mode="before")
    @classmethod
    def _alias_moe_impl(cls, v):
        # reference spellings (block.py:193): megablocks = dropless dMoE,
        # contrastors = the naive loop whose TPU analogue is the capacity
        # dispatch
        aliases = {"megablocks": "dropless", "contrastors": "capacity"}
        v = aliases.get(v, v)
        if v not in ("auto", "dropless", "capacity"):
            raise ValueError(
                f"moe_impl must be 'auto', 'dropless' or 'capacity' (or "
                f"reference aliases 'megablocks'/'contrastors'), got {v!r}"
            )
        return v

    @field_validator("model_type")
    @classmethod
    def _check_model_type(cls, v):
        if v not in _MODEL_TYPES:
            raise ValueError(f"unknown model_type {v!r}; expected one of {_MODEL_TYPES}")
        return v

    @field_validator("attn_impl")
    @classmethod
    def _check_attn_impl(cls, v):
        # attention_core treats anything unrecognized as SDPA — a typo like
        # "pallas" would silently run the slow path for the whole job
        allowed = ("flash", "sdpa", "flash_always")
        if v not in allowed:
            raise ValueError(f"attn_impl must be one of {allowed}, got {v!r}")
        return v

    @field_validator("pooling")
    @classmethod
    def _check_pooling(cls, v):
        if v is not None and v not in _POOLINGS:
            raise ValueError(f"unknown pooling {v!r}; expected one of {_POOLINGS}")
        return v


class AugmentationCfg(_Base):
    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Optional[Tuple[float, float]] = None
    color_jitter: Optional[Union[float, Tuple[float, float, float]]] = None
    interpolation: Optional[str] = None
    re_prob: Optional[float] = None
    re_count: Optional[int] = None


class TransformsConfig(_Base):
    image_size: Union[int, Tuple[int, int]] = 224
    mean: Optional[Union[float, Tuple[float, float, float]]] = OPENAI_IMAGE_MEAN
    std: Optional[Union[float, Tuple[float, float, float]]] = OPENAI_IMAGE_STD
    resize_longest_max: bool = False
    fill_color: int = 0
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None


class ParallelArgs(_Base):
    """TPU mesh layout. All axes multiply to the total device count.

    data: pure data parallel (batch sharding + embedding all-gather for the
        contrastive loss). tensor/expert are optional scale-out axes with no
        reference counterpart (the CUDA reference is DDP-only,
        reference distributed.py:5-68).
    """

    data: int = -1  # -1 = all devices
    tensor: int = 1
    expert: int = 1
    # shard optimizer state over the data axis (ZeRO-ish; reference uses
    # DeepSpeed ZeRO-2, configs/deepspeed/ds_config.json)
    shard_optimizer_state: bool = True
    opt_state_shard_min_size: int = 2**16  # smaller leaves stay replicated
    remat: bool = False  # jax.checkpoint each block
    prefetch: int = 2  # host->device pipeline depth


class Config(_Base):
    train_args: TrainArgs

    data_args: Optional[Union[MLMDataArgs, ImageTextDataArgs, ContrastiveDataArgs]] = None
    text_data_args: Optional[ContrastiveDataArgs] = None
    model_args: Optional[ModelArgs] = None
    text_model_args: Optional[ModelArgs] = None
    vision_model_args: Optional[ModelArgs] = None
    tower_model_args: Optional[ModelArgs] = None
    transforms: Optional[TransformsConfig] = None
    parallel_args: ParallelArgs = ParallelArgs()
