"""Vision transformer trunk (CLIP / HF-ViT / DINOv2 / timm / EVA02).

TPU counterpart of the reference ViTModel (reference: models/vit/vit.py:22-276):
prenorm blocks with a linearly increasing stochastic-depth schedule in the
shifted layout (drop_path_rate1=dpr[i-1], drop_path_rate2=dpr[i]),
per-layer 2-D rope pass-through, and the reference's exact final-stage
dispatch (final LN vs EVA avg-pool without last LN).
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contrastors_tpu.layers.block import Block
from contrastors_tpu.layers.embeddings import PatchEmbedding
from contrastors_tpu.layers.norms import make_norm
from contrastors_tpu.models.model_config import TrunkConfig


class ViTModel(nn.Module):
    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> Dict[str, Any]:
        cfg = self.config
        hidden, rope = PatchEmbedding(config=cfg, dtype=self.dtype, name="embeddings")(
            pixel_values, deterministic=deterministic
        )
        if cfg.prepre_layernorm:
            hidden = make_norm(cfg, name="prepre_layernorm")(hidden).astype(self.dtype)

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.n_layer)
        residual = None
        block_cls = nn.remat(Block, static_argnums=(7,)) if self.remat else Block
        for i in range(cfg.n_layer):
            hidden, residual, _ = block_cls(
                config=cfg,
                dtype=self.dtype,
                drop_path_rate1=float(dpr[i - 1]) if i > 0 else 0.0,
                drop_path_rate2=float(dpr[i]),
                name=f"layers_{i}",
            )(hidden, residual, None, None, None, rope, deterministic)

        num_prefix = (0 if cfg.no_cls_token else 1) + cfg.register_tokens
        has_final_ln = cfg.prenorm and not cfg.no_last_ln

        def final_add(h, r):
            if cfg.resid_pdrop > 0.0 and not deterministic:
                h = nn.Dropout(rate=cfg.resid_pdrop, name="drop_f")(h, deterministic=False)
            return h.astype(r.dtype) + r

        if has_final_ln and cfg.global_pool is None:
            hidden = make_norm(cfg, name="ln_f")(final_add(hidden, residual)).astype(self.dtype)
        else:
            hidden = final_add(hidden, residual).astype(self.dtype)
            if cfg.global_pool == "avg":
                hidden = jnp.mean(hidden[:, num_prefix:], axis=1)
            if has_final_ln:
                hidden = make_norm(cfg, name="ln_f")(hidden).astype(self.dtype)

        return {"last_hidden_state": hidden}
