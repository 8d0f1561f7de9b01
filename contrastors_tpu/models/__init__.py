from contrastors_tpu.models.model_config import TrunkConfig  # noqa: F401
from contrastors_tpu.models.nomic_bert import (  # noqa: F401
    NomicBertForPreTraining,
    NomicBertForSequenceClassification,
    NomicBertModel,
)
from contrastors_tpu.models.decoder import DecoderModel  # noqa: F401
from contrastors_tpu.models.vit import ViTModel  # noqa: F401
from contrastors_tpu.models.biencoder import BiEncoder, LogitScale  # noqa: F401
from contrastors_tpu.models.dual_encoder import DualEncoder  # noqa: F401
