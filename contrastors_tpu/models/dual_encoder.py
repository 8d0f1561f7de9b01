"""DualEncoder: CLIP/LiT two-tower model with in-forward symmetric loss.

TPU counterpart of the reference DualEncoder
(reference: models/dual_encoder/modeling_dual_encoder.py:10-68). The forward
computes the symmetric CLIP loss itself; under pjit the embedding gather is
jax.lax.all_gather over the data mesh axis (differentiable by construction,
unlike the reference's torch.distributed.nn.all_gather workaround).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.models.biencoder import BiEncoder, LogitScale
from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.losses import clip_loss_symmetric


class DualEncoder(nn.Module):
    text_config: TrunkConfig
    vision_config: TrunkConfig
    text_pooling: str = "mean"
    vision_pooling: str = "map"
    text_trunk_type: str = "encoder"
    freeze_text: bool = True
    text_hamming: bool = False
    logit_scale_init: float = 1 / 0.07
    trainable_logit_scale: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.text = BiEncoder(
            config=self.text_config,
            trunk_type=self.text_trunk_type,
            pooling=self.text_pooling,
            hamming=self.text_hamming,
            freeze=self.freeze_text,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.vision = BiEncoder(
            config=self.vision_config,
            trunk_type="vision",
            pooling=self.vision_pooling,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.logit_scale = LogitScale(
            logit_scale_init=self.logit_scale_init, trainable=self.trainable_logit_scale
        )

    def encode_text(self, input_ids, attention_mask=None, normalize=True, deterministic=True):
        return self.text(
            input_ids=input_ids,
            attention_mask=attention_mask,
            normalize=normalize,
            deterministic=deterministic,
        )["embedding"]

    def encode_image(self, pixel_values, normalize=True, deterministic=True):
        return self.vision(
            pixel_values=pixel_values, normalize=normalize, deterministic=deterministic
        )["embedding"]

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        pixel_values: Optional[jnp.ndarray] = None,
        text_embeddings: Optional[jnp.ndarray] = None,  # precomputed-text path
        axis_name: Optional[str] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        if text_embeddings is None:
            text_embeddings = self.encode_text(
                input_ids, attention_mask, normalize=True, deterministic=deterministic
            )
        image_embeddings = self.encode_image(
            pixel_values, normalize=True, deterministic=deterministic
        )
        loss = clip_loss_symmetric(
            image_embeddings,
            text_embeddings,
            self.logit_scale,
            axis_name=axis_name,
        )
        return {
            "loss": loss,
            "text_embedding": text_embeddings,
            "image_embedding": image_embeddings,
        }
