"""CLIP / LiT image-text trainer (model_type: clip | locked_text).

TPU counterpart of the reference ImageTextTrainer
(reference: trainers/image_text.py:29-254): DualEncoder with a (usually
frozen) text tower and a trainable ViT, tar-shard image-text data, symmetric
CLIP loss computed inside the model forward, ImageNet zero-shot eval, and
separate vision-tower export.
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contrastors_tpu.data.image_text import ImageTextDataset, SharedEpoch, get_imagenet
from contrastors_tpu.models.auto import load_biencoder, _load_hf_config
from contrastors_tpu.models.dual_encoder import DualEncoder
from contrastors_tpu.models.auto import trunk_config_from_hf_dict
from contrastors_tpu.trainers.base import BaseTrainer


class ImageTextTrainer(BaseTrainer):
    def _uses_grad_accumulation(self) -> bool:
        return False  # custom train step updates every loop step

    def get_tokenizer(self):
        margs = self.config.text_model_args
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(margs.tokenizer_name or margs.model_name)

    def get_model(self):
        text_args = self.config.text_model_args
        vision_args = self.config.vision_model_args

        self.rng, r1, r2 = jax.random.split(self.rng, 3)
        text_module, text_params, text_cfg = load_biencoder(text_args, dtype=self.dtype, rng=r1)
        vis_module, vis_params, vis_cfg = load_biencoder(vision_args, dtype=self.dtype, rng=r2)

        module = DualEncoder(
            text_config=text_cfg,
            vision_config=vis_cfg,
            text_pooling=text_args.pooling or "mean",
            vision_pooling=vision_args.pooling or "map",
            freeze_text=text_args.freeze,
            text_hamming=text_args.hamming,
            logit_scale_init=vision_args.logit_scale,
            trainable_logit_scale=vision_args.trainable_logit_scale,
            dtype=self.dtype,
            remat=vision_args.gradient_checkpointing,
        )
        # init the combined tree, then overlay the separately-loaded towers
        dummy_px = jnp.zeros((1, vis_cfg.num_channels, vis_cfg.img_size, vis_cfg.img_size))
        dummy_ids = jnp.zeros((1, 8), jnp.int32)
        params = module.init(
            self.rng, input_ids=dummy_ids, attention_mask=jnp.ones_like(dummy_ids), pixel_values=dummy_px
        )
        params = _overlay_tower(params, "text", text_params)
        params = _overlay_tower(params, "vision", vis_params)
        self.dual = module
        return module, params

    def frozen_mask(self):
        text_args = self.config.text_model_args
        mask = jax.tree_util.tree_map(lambda _: True, self.params)
        if text_args.freeze:
            import flax

            m = flax.core.unfreeze(mask) if hasattr(mask, "unfreeze") else mask
            m["params"]["text"] = jax.tree_util.tree_map(
                lambda _: False, m["params"]["text"]
            )
            mask = m
        return mask

    def get_dataloaders(self):
        dargs = self.config.data_args
        text_args = self.config.text_model_args
        self.shared_epoch = SharedEpoch(0)
        mean = std = None
        if self.config.transforms:
            mean, std = self.config.transforms.mean, self.config.transforms.std
        ds = ImageTextDataset(
            dargs.image_text_shards,
            global_batch_size=dargs.batch_size,
            tokenizer=self.tokenizer,
            image_size=(self.config.transforms.image_size if self.config.transforms else 224),
            seq_len=text_args.seq_len or 77,
            seed=dargs.seed,
            resampled=dargs.dataset_resampled,
            train_num_samples=dargs.train_num_samples,
            precomputed_text=text_args.precomputed,
            shared_epoch=self.shared_epoch,
            mean=mean,
            std=std,
            mlm_prob=getattr(dargs, "mlm_prob", None),
            # grad-cache steps normalize uint8 pixels on device per chunk;
            # ship them raw (4x smaller host->device transfer at 16k batch)
            ship_uint8=bool(self.config.train_args.grad_cache),
        )
        steps = ds.num_batches or (dargs.train_num_samples or 10**9) // dargs.batch_size
        return ds, steps

    def make_train_step(self):
        if self.config.train_args.grad_cache:
            return self._make_grad_cache_step()

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                out = self.dual.apply(
                    p,
                    input_ids=batch.get("input_ids"),
                    attention_mask=batch.get("attention_mask"),
                    pixel_values=batch["pixel_values"],
                    text_embeddings=batch.get("text_embeddings"),
                    deterministic=False,
                    rngs={"dropout": rng},
                )
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            scale = new_params["params"]["logit_scale"]["logit_scale"]
            return (
                new_params,
                new_opt,
                {"loss": loss, "grad_norm": optax.global_norm(grads), "logit_scale": jnp.exp(scale)},
            )

        return train_step

    def _make_grad_cache_step(self):
        """Large-batch LiT/CLIP step via the chunked-remat grad cache.

        The reference reaches global batch 16,384 for the vision alignment
        recipe with DeepSpeed ZeRO-2 + CPU offload (reference
        configs/deepspeed/image_text.json:17-28, trainers/base.py:141-159);
        here the grad cache bounds vision-tower activation memory at one
        chunk, and in LiT only the vision tower needs pass 2 at all — the
        text side is frozen (d_trainable=False skips its replay) or fed
        precomputed embeddings (reference image_text_loader.py:480).

        On a data axis > 1 the step runs inside shard_map: each device
        chunks its local rows, the symmetric loss runs on the sharded
        [local, global] similarity matrices, and param grads arrive summed
        via the replicated-input transpose psum (same design as the
        text grad-cache step — SURVEY §7 hard part 8).
        """
        from contrastors_tpu.grad_cache import grad_cache_loss_and_grads
        from contrastors_tpu.losses import clip_loss_symmetric

        ta = self.config.train_args
        text_args = self.config.text_model_args
        chunk = ta.chunk_size or 64
        precomputed = bool(text_args.precomputed)
        text_trainable = not (text_args.freeze or precomputed)
        # hybrid direct chunks (exact; see grad_cache.py): leading image
        # chunks keep live vjp activations and skip the pass-2 re-forward —
        # the structural lever against the vision step's many-small-chunk
        # launch overhead (ROADMAP round-4 vision decomposition). A direct
        # text chunk is wasted HBM when the text tower is frozen (its vjp
        # would be held but never consumed), so force it off there.
        direct_q = getattr(ta, "grad_cache_direct_chunks_q", 0)  # image tower
        direct_d = getattr(ta, "grad_cache_direct_chunks_d", 0) if text_trainable else 0
        embed_par = getattr(ta, "grad_cache_embed_parallel", 1)
        trainable_scale = self.config.vision_model_args.trainable_logit_scale
        from contrastors_tpu.grad_cache import grad_cache_data_axis

        ndata = self.mesh.shape.get("data", 1)
        gc_axis = grad_cache_data_axis(self.mesh)

        def encode_image(params, chunk_batch, chunk_rng):
            px = chunk_batch["pixel_values"]
            if px.dtype == jnp.uint8:
                # pixels ship to the device as uint8 (4x smaller HBM/PCIe
                # footprint at 16k-batch scale) and normalize per chunk in
                # float32 — casting AFTER the normalize keeps the result
                # bit-identical to the host-float32 pipeline under any
                # compute dtype (bf16 intermediates would round differently)
                mean, std = self._pixel_stats()
                px = ((px.astype(jnp.float32) / 255.0 - mean) / std).astype(self.dtype)
            emb = self.dual.apply(
                params, method=self.dual.encode_image, pixel_values=px,
                deterministic=False, rngs={"dropout": chunk_rng},
            )
            return {"embedding": emb}

        def encode_text(params, chunk_batch, chunk_rng):
            if "text_embeddings" in chunk_batch:
                return {"embedding": chunk_batch["text_embeddings"]}
            emb = self.dual.apply(
                params, method=self.dual.encode_text,
                input_ids=chunk_batch["input_ids"],
                attention_mask=chunk_batch["attention_mask"],
                deterministic=False, rngs={"dropout": chunk_rng},
            )
            return {"embedding": emb}

        def scale_fn(extra):
            s = extra["logit_scale"]
            if not trainable_scale:
                s = jax.lax.stop_gradient(s)
            return lambda x: x * jnp.exp(s)

        def loss_fn(img, txt, extra):
            loss = clip_loss_symmetric(img, txt, scale_fn(extra), axis_name=gc_axis)
            if gc_axis is not None:
                # local mean scaled so the device-sum of grads equals the
                # global-batch mean objective
                loss = loss / ndata
            return loss

        def gc_compute(params, img_b, txt_b, rng):
            if gc_axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(gc_axis))
            # chunk is per-device; clamp to a divisor of the local rows
            from contrastors_tpu.parallel import divisor_chunk

            rows = img_b["pixel_values"].shape[0]
            loss, grads, extra_grads = grad_cache_loss_and_grads(
                params, img_b, txt_b, encode_image, encode_text, loss_fn,
                chunk_size=divisor_chunk(chunk, rows), rng=rng,
                d_trainable=text_trainable,
                extra_params=params["params"]["logit_scale"],
                direct_chunks=direct_q, direct_chunks_d=direct_d,
                embed_parallel=embed_par,
            )
            # the logit scale lives inside the dual params tree; its pass-2
            # grad is zero (the encoders never touch it) — add the
            # loss-stage grad in place
            grads = dict(grads)
            grads["params"] = dict(grads["params"])
            grads["params"]["logit_scale"] = jax.tree_util.tree_map(
                jnp.add, grads["params"]["logit_scale"], extra_grads
            )
            if gc_axis is not None:
                loss = jax.lax.psum(loss, gc_axis)
            return loss, grads

        if gc_axis is not None:
            from contrastors_tpu.grad_cache import shard_map_grad_cache

            gc_fn = shard_map_grad_cache(gc_compute, self.mesh, n_outputs=2)
        else:
            gc_fn = gc_compute

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            img_b = {"pixel_values": batch["pixel_values"]}
            if "text_embeddings" in batch:
                txt_b = {"text_embeddings": batch["text_embeddings"]}
            else:
                txt_b = {
                    "input_ids": batch["input_ids"],
                    "attention_mask": batch["attention_mask"],
                }
            loss, grads = gc_fn(params, img_b, txt_b, rng)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            scale = new_params["params"]["logit_scale"]["logit_scale"]
            return (
                new_params,
                new_opt,
                {
                    "loss": loss,
                    "grad_norm": optax.global_norm(grads),
                    "logit_scale": jnp.exp(scale),
                },
            )

        return train_step

    def _pixel_stats(self):
        """(mean, std) as float32 [3,1,1] arrays for on-device normalization
        of uint8 pixel batches (normalize in fp32, cast to compute dtype
        after — see encode_image)."""
        from contrastors_tpu.config import OPENAI_IMAGE_MEAN, OPENAI_IMAGE_STD

        t = self.config.transforms
        mean = np.asarray(
            (t.mean if t and t.mean else OPENAI_IMAGE_MEAN), np.float32
        ).reshape(3, 1, 1)
        std = np.asarray(
            (t.std if t and t.std else OPENAI_IMAGE_STD), np.float32
        ).reshape(3, 1, 1)
        return jnp.asarray(mean), jnp.asarray(std)

    # -- eval -------------------------------------------------------------
    def eval_loop(self, step: int):
        dargs = self.config.data_args
        metrics = {}
        if dargs.eval_flickr and dargs.flickr_shards:
            metrics.update(self._flickr_eval())
        if not dargs.imagenet_val_path:
            return metrics
        from contrastors_tpu.eval.zero_shot import (
            evaluate_imagenet,
            zeroshot_classifier_weights,
        )
        from contrastors_tpu.data.constants import IMAGENET_CLASSNAMES

        enc_text, enc_img = self._eval_encoders()

        def encode_text(texts):
            enc = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.config.text_model_args.seq_len or 77, return_tensors="np",
            )
            return np.asarray(
                enc_text(self.params, jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]))
            )

        weights = zeroshot_classifier_weights(encode_text, IMAGENET_CLASSNAMES)
        batches = get_imagenet(dargs.imagenet_val_path, batch_size=dargs.eval_batch_size)
        metrics.update(
            evaluate_imagenet(
                lambda px: np.asarray(enc_img(self.params, jnp.asarray(px))), weights, batches
            )
        )
        return metrics

    def _eval_encoders(self):
        """Jitted tower encoders taking params as an ARGUMENT — a closure
        over self.params would bake the weights in as XLA constants
        (compile-memory blowup at real scale) and recompile on every eval
        call; these compile once per trainer."""
        if not hasattr(self, "_eval_enc"):

            @jax.jit
            def enc_text(params, ids, mask):
                return self.dual.apply(
                    params, method=self.dual.encode_text, input_ids=ids, attention_mask=mask
                )

            @jax.jit
            def enc_img(params, px):
                return self.dual.apply(params, method=self.dual.encode_image, pixel_values=px)

            self._eval_enc = (enc_text, enc_img)
        return self._eval_enc

    def _flickr_eval(self):
        """Flickr-style paired retrieval recall (reference
        image_text.py:229-244)."""
        from contrastors_tpu.data.image_text import ImageTextDataset
        from contrastors_tpu.eval.image_text_retrieval import evaluate_image_text_retrieval

        dargs = self.config.data_args
        text_args = self.config.text_model_args
        ds = ImageTextDataset(
            dargs.flickr_shards,
            global_batch_size=dargs.eval_batch_size,
            tokenizer=self.tokenizer,
            image_size=(self.config.transforms.image_size if self.config.transforms else 224),
            is_train=False,
            seq_len=text_args.seq_len or 77,
            shuffle_buffer=0,
        )

        enc_txt, enc_img = self._eval_encoders()
        res = evaluate_image_text_retrieval(
            lambda px: enc_img(self.params, jnp.asarray(px)),
            lambda ids, m: enc_txt(self.params, jnp.asarray(ids), jnp.asarray(m)),
            iter(ds),
        )
        return {f"flickr/{k}": v for k, v in res.items()}

    def save_vision_tower(self, out_dir: str):
        """Strip to the vision tower for export
        (reference image_text.py:128-152)."""
        import orbax.checkpoint as ocp
        import os

        vision = {"params": self.params["params"]["vision"]}
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(os.path.join(out_dir, "vision_tower")), vision, force=True)


def _overlay_tower(params, tower: str, tower_params):
    """Overlay separately-loaded tower params onto the combined dual tree.

    Strict: every source leaf must land on an identically-shaped
    destination leaf — a renamed or reshaped tower param silently leaving
    random init in place is exactly the failure mode the shape-checked
    overlay in models/auto.py guards against for single towers.
    """
    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    src = tower_params["params"] if "params" in tower_params else tower_params

    dropped = []

    def rec(dst, s, prefix):
        for k, v in s.items():
            path = prefix + (str(k),)
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    rec(dst[k], v, path)
                else:
                    dropped.append("/".join(path) + "/**")
            elif k in dst:
                if isinstance(dst[k], dict):
                    raise ValueError(
                        f"tower '{tower}' overlay type mismatch at "
                        f"{'/'.join(path)}: checkpoint has an array where "
                        f"the model has a module subtree"
                    )
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"tower '{tower}' overlay shape mismatch at "
                        f"{'/'.join(path)}: checkpoint {tuple(v.shape)} vs "
                        f"model {tuple(dst[k].shape)}"
                    )
                dst[k] = jnp.asarray(v, dtype=dst[k].dtype)
            else:
                dropped.append("/".join(path))

    rec(p["params"][tower], src, ())
    if dropped:
        raise ValueError(
            f"tower '{tower}' overlay dropped {len(dropped)} checkpoint "
            f"key(s) not present in the model: {sorted(dropped)[:8]}"
        )
    return p
