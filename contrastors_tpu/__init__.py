"""contrastors_tpu: a TPU-native contrastive-learning framework.

Same capability surface as nomic-ai/contrastors, re-designed for
JAX/XLA/Pallas/pjit: flax model zoo (NomicBERT encoders, causal decoders,
ViTs, BiEncoder/DualEncoder towers), sharded InfoNCE/CLIP losses with
chunked-remat GradCache, mesh-parallel training, streaming data pipelines,
and HF checkpoint interop.
"""

__version__ = "0.1.0"

from contrastors_tpu.config import Config, TrainArgs, ModelArgs  # noqa: F401
from contrastors_tpu.read import read_config  # noqa: F401
