from contrastors_tpu.layers.attention import (  # noqa: F401
    AttentionPooling,
    MultiHeadAttention,
    MultiHeadAttentionPooling,
)
from contrastors_tpu.layers.block import Block, ParallelBlock  # noqa: F401
from contrastors_tpu.layers.embeddings import BertEmbeddings, PatchEmbedding  # noqa: F401
from contrastors_tpu.layers.mlp import MLP, GatedMLP, make_mlp  # noqa: F401
from contrastors_tpu.layers.moe import MoEMLP  # noqa: F401
from contrastors_tpu.layers.norms import LayerNorm, RMSNorm, make_norm  # noqa: F401
