"""Teacher->student embedding distillation trainer (model_type: distill).

TPU counterpart of the reference DistillTrainer (reference:
trainers/distill.py:96-483): a frozen teacher BiEncoder, a student whose
geometry may shrink (layers / width), student initialized by uniform element
selection with layer striding, and four loss modes (losses_distill.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from contrastors_tpu.losses_distill import distill_loss, init_student_from_teacher
from contrastors_tpu.models.auto import load_biencoder
from contrastors_tpu.trainers.text_text import TextTextTrainer


class DistillTrainer(TextTextTrainer):
    def _uses_grad_accumulation(self) -> bool:
        return False  # custom train step updates every loop step

    def get_model(self):
        margs = self.config.model_args  # student geometry
        teacher_args = self.config.tower_model_args  # teacher checkpoint
        assert teacher_args is not None, "distill requires tower_model_args (teacher)"

        self.rng, r1, r2 = jax.random.split(self.rng, 3)
        teacher_module, teacher_params, _ = load_biencoder(teacher_args, dtype=self.dtype, rng=r1)
        self.teacher = teacher_module
        self.teacher_params = teacher_params

        # student: same family, optionally shrunk geometry via overrides
        overrides = {}
        if margs.seq_len:
            overrides["n_positions"] = margs.seq_len
        student_module, student_params, cfg = load_biencoder(
            margs, dtype=self.dtype, rng=r2, trunk_overrides=overrides
        )
        if margs.distill_init_pretrained:
            t_layers = self.teacher_params["params"]["trunk"]
            s_layers = student_params["params"]["trunk"]
            import re

            n_t = len([k for k in t_layers if re.fullmatch(r"layers_\d+", k)])
            n_s = len([k for k in s_layers if re.fullmatch(r"layers_\d+", k)])
            stride = max(n_t // max(n_s, 1), 1)
            student_params = {
                "params": {
                    **student_params["params"],
                    "trunk": init_student_from_teacher(
                        {"params": s_layers}, {"params": t_layers}, layer_stride=stride
                    )["params"],
                }
            }
        self.student = student_module
        from contrastors_tpu.models.biencoder import LogitScale

        self.logit_scale = LogitScale(logit_scale_init=margs.logit_scale, trainable=False)
        scale_params = self.logit_scale.init(jax.random.PRNGKey(0), jnp.ones(()))
        self.biencoder = student_module
        return student_module, {"model": student_params, "logit_scale": scale_params}

    def make_train_step(self):
        ta = self.config.train_args
        mode = ta.distill_loss_fn
        temp = ta.distill_temperature
        teacher = self.teacher
        teacher_params = self.teacher_params

        def encode_teacher(batch_ids, batch_mask):
            out = teacher.apply(
                teacher_params, input_ids=batch_ids, attention_mask=batch_mask, normalize=False
            )
            return jax.lax.stop_gradient(out["embedding"])

        def loss_fn(params, batch, rng):
            rq, rd = jax.random.split(rng)
            sq = self._encode(
                params["model"], batch["query_input_ids"], batch["query_attention_mask"], rq
            )["embedding"]
            sd = self._encode(
                params["model"], batch["document_input_ids"], batch["document_attention_mask"], rd
            )["embedding"]
            tq = encode_teacher(batch["query_input_ids"], batch["query_attention_mask"])
            td = encode_teacher(batch["document_input_ids"], batch["document_attention_mask"])
            losses = distill_loss(mode, sq, sd, tq, td, temperature=temp)
            return losses["loss"], {k: v for k, v in losses.items() if k != "loss"}

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_params, new_opt, metrics

        return train_step
