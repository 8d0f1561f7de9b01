"""Token and patch embeddings (reference: layers/embedding.py:357-615).

BertEmbeddings keeps the XLM-R pad-aware position-id convention; rotary
models carry no absolute positions. PatchEmbedding expresses patchify as a
single reshape+matmul (einops rearrange -> one MXU matmul, same trick as the
reference) and returns the 2-D rope table when configured (EVA02).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contrastors_tpu.layers.rotary import build_2d_rope_cat


def pad_aware_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """XLM-R/fairseq convention: positions count non-pad tokens from
    pad_token_id+1 (reference embedding.py:559-572)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def sincos_2d_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = True) -> np.ndarray:
    """MAE-style fixed 2-D sin/cos table (reference embedding.py:32-91)."""
    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4")

    def one_axis(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h)  # w varies fastest (matches reference)
    # first half encodes the W coordinate: the reference's emb_h is built
    # from grid[0], which meshgrid(w, h) makes the W grid (embedding.py:66-70
    # — the name is misleading); verified == transformers ViTMAE's builder
    emb = np.concatenate([one_axis(gw), one_axis(gh)], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


class BertEmbeddings(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        position_ids: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        seqlen = input_ids.shape[1]
        word_emb = nn.Embed(
            cfg.vocab_size,
            cfg.n_embd,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            name="word_embeddings",
        )
        embeddings = word_emb(input_ids)

        use_abs_pos = cfg.n_positions > 0 and cfg.rotary_emb_fraction <= 0
        if use_abs_pos:
            if position_ids is None:
                if cfg.pad_token_id is not None and cfg.pad_token_id > 0:
                    position_ids = pad_aware_position_ids(input_ids, cfg.pad_token_id)
                else:
                    position_ids = jnp.arange(seqlen, dtype=jnp.int32)[None, :]
            pos_emb = nn.Embed(
                cfg.n_positions,
                cfg.n_embd,
                dtype=self.dtype,
                embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
                name="position_embeddings",
            )
            embeddings = embeddings + pos_emb(position_ids)

        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            type_emb = nn.Embed(
                cfg.type_vocab_size,
                cfg.n_embd,
                dtype=self.dtype,
                embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
                name="token_type_embeddings",
            )
            embeddings = embeddings + type_emb(token_type_ids)
        return embeddings


class PatchEmbedding(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pixel_values: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """pixel_values: [B, C, H, W] (torch layout for interop).
        Returns (embeddings [B, N(+prefix), D], rope table or None)."""
        cfg = self.config
        B, C, Himg, Wimg = pixel_values.shape
        p = cfg.patch_size
        gh, gw = Himg // p, Wimg // p

        # b c (h p1) (w p2) -> b (h w) (c p1 p2): one reshape + transpose,
        # then a single MXU matmul (reference embedding.py:465-479).
        x = pixel_values.reshape(B, C, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gh * gw, C * p * p)
        x = nn.Dense(
            cfg.n_embd, use_bias=cfg.patch_embed_bias, dtype=self.dtype, name="proj"
        )(x.astype(self.dtype))

        num_patches = (cfg.img_size // p) * (cfg.img_size // p)
        to_cat = []
        cls_token = None
        if not cfg.no_cls_token:
            cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.n_embd), jnp.float32)

        pos_embed = None
        if cfg.use_pos_embed:
            if cfg.sinusoidal_pos_embedding:
                table = sincos_2d_pos_embed(cfg.n_embd, cfg.img_size // p, cls_token=True)
                pos_embed = jnp.asarray(table)[None]
            else:
                # timm-dinov2-with-registers quirk: table has no cls slot
                # (reference embedding.py:382-391)
                n = num_patches if cfg.register_tokens > 0 else num_patches + 1
                pos_embed = self.param(
                    "pos_embed",
                    nn.initializers.normal(stddev=0.02),
                    (1, n, cfg.n_embd),
                    jnp.float32,
                )

        if cls_token is not None:
            tok = jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, cfg.n_embd))
            if cfg.sinusoidal_pos_embedding and pos_embed is not None:
                tok = tok + pos_embed[:, :1].astype(x.dtype)
            to_cat.append(tok)
        if cfg.register_tokens > 0:
            reg = self.param(
                "reg_token",
                nn.initializers.normal(stddev=0.02),
                (1, cfg.register_tokens, cfg.n_embd),
                jnp.float32,
            )
            to_cat.append(jnp.broadcast_to(reg.astype(x.dtype), (B, cfg.register_tokens, cfg.n_embd)))

        rope = None
        if cfg.use_rotary_pos_emb:
            rope = build_2d_rope_cat(
                cfg.head_dim, (gh, gw), ref_feat_shape=cfg.ref_feat_shape
            )

        def add_pos(emb, table):
            if table is None:
                return emb
            t = table.astype(emb.dtype)
            if t.shape[1] != emb.shape[1]:
                t = interpolate_pos_embed(t, emb.shape[1], has_cls=not cfg.no_embed_class and not cfg.no_cls_token)
            return emb + t

        if cfg.no_embed_class:
            # positions on patches only, prefix tokens appended after
            if cfg.sinusoidal_pos_embedding and pos_embed is not None:
                x = add_pos(x, pos_embed[:, 1:])
            else:
                x = add_pos(x, pos_embed)
            if to_cat:
                x = jnp.concatenate(to_cat + [x], axis=1)
        else:
            if to_cat:
                x = jnp.concatenate(to_cat + [x], axis=1)
            x = add_pos(x, pos_embed)

        if cfg.patch_dropout > 0.0 and not deterministic:
            if rope is not None:
                # kept patches would misalign with the full-grid rope rows
                # (the reference returns the full table after dropping
                # patches too, embedding.py:514-516 — a latent bug there;
                # no recipe combines the two, so fail loudly here)
                raise ValueError(
                    "patch_dropout > 0 is unsupported with 2-D rotary position "
                    "embeddings; disable one of them"
                )
            x = patch_dropout(x, cfg.patch_dropout, self.make_rng("dropout"), exclude_first=True)
        return x, rope


def interpolate_pos_embed(table: jnp.ndarray, target_len: int, has_cls: bool = True) -> jnp.ndarray:
    """Bicubic-ish (jax.image cubic) interpolation of a square patch grid
    (reference embedding.py:432-463)."""
    cls_part = table[:, :1] if has_cls else None
    patch = table[:, 1:] if has_cls else table
    n = patch.shape[1]
    side = int(math.sqrt(n))
    tgt = target_len - (1 if has_cls else 0)
    tgt_side = int(math.sqrt(tgt))
    grid = patch.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, tgt_side, tgt_side, grid.shape[-1]), method="cubic")
    patch = grid.reshape(1, tgt_side * tgt_side, -1)
    return jnp.concatenate([cls_part, patch], axis=1) if has_cls else patch


def patch_dropout(x: jnp.ndarray, prob: float, rng: jax.Array, exclude_first: bool = True) -> jnp.ndarray:
    """Keep a random subset of patches (reference embedding.py:519-557)."""
    cls_part = x[:, :1] if exclude_first else None
    patches = x[:, 1:] if exclude_first else x
    B, N, D = patches.shape
    keep = max(1, int(N * (1.0 - prob)))
    scores = jax.random.normal(rng, (B, N))
    _, idx = jax.lax.top_k(scores, keep)
    kept = jnp.take_along_axis(patches, idx[:, :, None], axis=1)
    return jnp.concatenate([cls_part, kept], axis=1) if exclude_first else kept
