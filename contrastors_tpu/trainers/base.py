"""BaseTrainer: owns the whole run.

TPU counterpart of the reference BaseTrainer (reference: trainers/base.py:28-533):
seeding, tracker, tokenizer, model/data/optimizer/scheduler construction,
checkpoint save/load (orbax for the train-state pytree + dataset cursor +
PRNG key, replacing torch.save + per-rank CUDA RNG capture, base.py:275-344),
and the train loop with gradient accumulation, grad clipping, periodic eval
and save. DeepSpeed is gone: the train step is one jitted SPMD function over
the mesh; grads average at the jit boundary.
"""

import os
import time
from abc import ABC, abstractmethod
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.config import Config
from contrastors_tpu.parallel import make_mesh, shard_batch
from contrastors_tpu.utils.logging import Tracker
from contrastors_tpu.utils.optim import make_optimizer, make_schedule

DTYPES = {"bf16": jnp.bfloat16, "fp32": jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}

# Process-wide async checkpointer (lazy). An async save copies device
# arrays to host synchronously — so the train step may donate the param
# buffers immediately after save_state returns — then serializes and writes
# to disk on a background thread, overlapping subsequent train steps
# (the reference's DeepSpeed save, base.py:275-344, blocks training for the
# whole write). Shared across trainer instances so a later load can always
# wait on an in-flight save.
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_pending_saves():
    """Block until any in-flight async checkpoint write is durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


class BaseTrainer(ABC):
    def __init__(self, config: Config, dtype: str = "bf16"):
        self.config = config
        self.dtype = DTYPES[dtype]
        ta = config.train_args
        self.seed = ta.seed if ta.seed is not None else getattr(config.data_args, "seed", 42)
        self.rng = jax.random.PRNGKey(self.seed)

        pa = config.parallel_args
        self.mesh = make_mesh(pa.data, pa.tensor, pa.expert)
        self.process_index = jax.process_index()

        # moe_impl="auto": dropless (megablocks semantics, Pallas gmm) on a
        # single host; capacity under expert parallelism — the dropless
        # ragged layout cannot be partitioned over "expert" by GSPMD (it
        # would all-gather every expert weight per device; see layers/moe.py
        # and test_expert_parallel.py's HLO assertions)
        ep = self.mesh.shape.get("expert", 1)
        for margs_ in (
            config.model_args,
            config.text_model_args,
            config.vision_model_args,
            config.tower_model_args,
        ):
            if margs_ is not None and getattr(margs_, "moe_impl", None) == "auto":
                margs_.moe_impl = "capacity" if ep > 1 else "dropless"
                if getattr(margs_, "num_experts", 0):
                    print(f"[moe] moe_impl=auto -> {margs_.moe_impl} (expert axis = {ep})")

        self.tokenizer = self.get_tokenizer()
        self.dataloader, self.steps_per_epoch = self.get_dataloaders()
        self.total_steps = ta.num_train_steps or (ta.num_epochs * self.steps_per_epoch)

        self.model, self.params = self.get_model()
        # place params on the mesh: replicated by default; expert tensors on
        # "expert", Megatron-style column/row splits on "tensor" when those
        # axes are >1 (parallel/sharding.py rules)
        from contrastors_tpu.parallel.sharding import param_shardings

        self.params = jax.tree_util.tree_map(
            jax.device_put, self.params, param_shardings(self.params, self.mesh)
        )

        warmup = ta.warmup_steps or (
            int(self.total_steps * ta.warmup_pct) if ta.warmup_pct else 0
        )
        self.schedule = make_schedule(
            ta.schedule_type, ta.learning_rate, self.total_steps, warmup, ta.cooldown_steps
        )
        # total_steps/warmup_steps (and the logged lr) are in LOOP-step
        # units, but optax's schedule count increments once per APPLIED
        # update — one per gradient_accumulation_steps loop steps — so the
        # schedule handed to the optimizer maps update-count back to loop
        # steps (otherwise warmup/decay run ga-times too slowly). Trainers
        # whose custom train steps apply an update EVERY loop step must not
        # get the remap (their update count == loop count), and silently
        # ignoring ga there would be worse — reject it.
        ga = ta.gradient_accumulation_steps or 1
        if ga > 1 and not self._uses_grad_accumulation():
            raise ValueError(
                "gradient_accumulation_steps > 1 is not supported by this "
                "trainer's custom train step (grad-cache / dual-encoder / "
                "distill apply an optimizer update every loop step); raise "
                "chunk_size or batch_size instead"
            )
        opt_schedule = (lambda count: self.schedule(count * ga)) if ga > 1 else self.schedule
        self.tx = make_optimizer(
            self.params,
            opt_schedule,
            weight_decay=ta.weight_decay,
            beta1=ta.adam_beta1,
            beta2=ta.adam_beta2,
            eps=ta.eps,
            max_grad_norm=ta.max_grad_norm,
            frozen_mask=self.frozen_mask(),
        )
        self.opt_state = self.tx.init(self.params)
        if pa.shard_optimizer_state and self.mesh.shape.get("data", 1) > 1:
            from contrastors_tpu.parallel.sharding import shard_optimizer_state

            self.opt_state = shard_optimizer_state(
                self.opt_state, self.mesh, min_size=pa.opt_state_shard_min_size
            )
        self.step = 0

        # EMA weights (reference: base.py:387-392, config.py:179 — the hook
        # exists there but is vestigial; here it's functional)
        margs = config.model_args or config.text_model_args
        self.ema_params = None
        if margs is not None and getattr(margs, "ema", False):
            self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
            decay = float(getattr(margs, "ema_decay", 0.999))

            @jax.jit
            def _ema(e, p):
                return jax.tree_util.tree_map(lambda a, b: decay * a + (1 - decay) * b, e, p)

            self._ema_update = _ema

        self.tracker = Tracker(
            enabled_wandb=ta.wandb,
            project=ta.wandb_project_name,
            entity=ta.wandb_entity,
            run_name=ta.wandb_run_name,
            group=ta.wandb_group,
            output_dir=ta.output_dir,
            hyperparams=config.model_dump(),
            print_every=ta.log_lr_every,
        )

        if ta.checkpoint:
            self.load_state(ta.checkpoint)

    # -- hooks ---------------------------------------------------------------
    def get_tokenizer(self):
        margs = self.config.model_args or self.config.text_model_args
        name = margs.tokenizer_name or margs.model_name
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name)

    def frozen_mask(self):
        """pytree of bools, True = trainable; None = all trainable."""
        return None

    @abstractmethod
    def get_model(self):
        ...

    @abstractmethod
    def get_dataloaders(self):
        """-> (iterator over host batches, steps_per_epoch)"""
        ...

    @abstractmethod
    def make_train_step(self):
        """-> jitted fn(params, opt_state, batch, rng, step) ->
        (params, opt_state, metrics)"""
        ...

    def transform_host_batch(self, host_batch):
        """Hook: host-side (numpy) batch rewrite before device upload —
        e.g. sequence packing (data/packing.py). Default: identity."""
        return host_batch

    def eval_loop(self, step: int):  # optional
        return {}

    def _uses_grad_accumulation(self) -> bool:
        """True when this trainer's train step honors
        gradient_accumulation_steps (the standard stepper does; trainers
        with custom steps override this to False — see __init__'s LR
        schedule remap)."""
        return True

    def make_standard_train_step(self, loss_fn, post_update=None):
        """Build a step from loss_fn(params, batch, rng) -> (loss, metrics),
        with gradient accumulation when
        train_args.gradient_accumulation_steps > 1 (reference
        base.py:375-385: step-modulo accumulation; here grads accumulate on
        device and the optimizer applies the mean every N micro-batches)."""
        import functools

        import optax

        ga = self.config.train_args.gradient_accumulation_steps or 1

        @jax.jit
        def grad_step(params, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            return loss, metrics, grads

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def apply_step(params, opt_state, grads):
            if ga > 1:
                grads = jax.tree_util.tree_map(lambda g: g / ga, grads)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if post_update is not None:
                new_params = post_update(new_params)
            return new_params, new_opt, optax.global_norm(grads)

        if ga == 1:

            def step(params, opt_state, batch, rng):
                loss, metrics, grads = grad_step(params, batch, rng)
                params, opt_state, gnorm = apply_step(params, opt_state, grads)
                metrics = dict(metrics)
                metrics["loss"] = loss
                metrics["grad_norm"] = gnorm
                return params, opt_state, metrics

            return step

        state = {"accum": None, "micro": 0}

        @functools.partial(jax.jit, donate_argnums=(0,))
        def add(accum, grads):
            return jax.tree_util.tree_map(jnp.add, accum, grads)

        def step(params, opt_state, batch, rng):
            loss, metrics, grads = grad_step(params, batch, rng)
            state["accum"] = grads if state["accum"] is None else add(state["accum"], grads)
            state["micro"] += 1
            metrics = dict(metrics)
            metrics["loss"] = loss
            if state["micro"] % ga == 0:
                params, opt_state, gnorm = apply_step(params, opt_state, state["accum"])
                state["accum"] = None
                metrics["grad_norm"] = gnorm
            return params, opt_state, metrics

        return step

    # -- checkpointing ---------------------------------------------------------
    def save_state(self, out_dir: str, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(out_dir, f"step_{step}"))
        state = {"params": self.params, "opt_state": self.opt_state, "rng": self.rng}
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        # async on a single process; multihost keeps the sync path (async
        # commit coordination needs a jax.distributed barrier on every host)
        if self.config.train_args.async_checkpointing and jax.process_count() == 1:
            ckptr = _async_checkpointer()
            ckptr.wait_until_finished()  # at most one save in flight
            ckptr.save(
                os.path.join(path, "state"), args=ocp.args.StandardSave(state), force=True
            )
        else:
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(os.path.join(path, "state"), state, force=True)
        if hasattr(self.dataloader, "save_state"):
            self.dataloader.save_state(path)
        if self.process_index == 0:
            with open(os.path.join(path, "step.txt"), "w") as f:
                f.write(str(step))
            if hasattr(self, "trunk_config"):
                with open(os.path.join(path, "trunk_config.json"), "w") as f:
                    f.write(self.trunk_config.to_json())

    def load_state(self, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        wait_pending_saves()  # a just-written checkpoint may still be in flight
        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": self.params, "opt_state": self.opt_state, "rng": self.rng}
            if self.ema_params is not None:
                target["ema_params"] = self.ema_params
            restored = ckptr.restore(os.path.join(path, "state"), target)
        if self.ema_params is not None:
            self.ema_params = restored["ema_params"]
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.rng = restored["rng"]
        if hasattr(self.dataloader, "load_state"):
            self.dataloader.load_state(path)
        step_file = os.path.join(path, "step.txt")
        if os.path.exists(step_file):
            self.step = int(open(step_file).read().strip())
        print(f"[trainer] resumed from {path} at step {self.step}")

    # -- loop ------------------------------------------------------------------
    def train(self):
        ta = self.config.train_args
        # deferred until after the first batch's transform_host_batch: the
        # packed-auto heuristic (text_text.py) may flip the packing flag the
        # step closure branches on
        train_step = None
        profile_dir = None
        if ta.profile:
            profile_dir = os.path.join(ta.output_dir or ".", "trace")
            jax.profiler.start_trace(profile_dir)

        t_start = time.time()
        last_log = t_start
        examples = 0
        from contrastors_tpu.utils.prefetch import PrefetchIterator

        depth = self.config.parallel_args.prefetch

        def _prepare(host_batch):
            """Transform + device_put one host batch. Runs in the PREFETCH
            WORKER thread when prefetching: shard_batch's host->device upload
            then overlaps the in-flight step instead of serializing in front
            of the next one (measured 124 ms/batch exposed on a remote-device
            link for the 512-pair flagship batch — scripts/ablate_e2e.py;
            device_put is async + thread-safe, so the worker only pays the
            enqueue)."""
            host_batch = self.transform_host_batch(host_batch)
            meta = {k: v for k, v in host_batch.items() if not isinstance(v, np.ndarray)}
            arrays = {k: v for k, v in host_batch.items() if isinstance(v, np.ndarray)}
            return meta, arrays, shard_batch(arrays, self.mesh)

        def fresh_iter():
            it = iter(self.dataloader)
            if depth and depth > 0:
                # background thread runs tokenization/decoding AND the
                # device upload while the TPU executes the previous step
                # (SURVEY.md §7 hard part 7)
                return PrefetchIterator(it, transform=_prepare, depth=depth)
            return map(_prepare, it)

        data_iter = fresh_iter()
        lang_losses: dict = {}  # per-language device scalars since last log
        with self.mesh:
            while self.step < self.total_steps:
                try:
                    meta, arrays, batch = next(data_iter)
                except StopIteration:
                    data_iter = fresh_iter()
                    meta, arrays, batch = next(data_iter)

                if train_step is None:
                    # deferred until after the first batch's
                    # transform_host_batch (queue put/get orders it): the
                    # packed-auto heuristic may flip the flag the step
                    # closure branches on
                    train_step = self.make_train_step()
                if meta.get("cursor_snapshot") is not None and hasattr(
                    self.dataloader, "note_consumed"
                ):
                    # checkpoint the cursor of the batch being TRAINED on,
                    # not wherever the prefetch worker has read ahead to
                    self.dataloader.note_consumed(meta["cursor_snapshot"])

                self.rng, step_rng = jax.random.split(self.rng)
                self.params, self.opt_state, metrics = train_step(
                    self.params, self.opt_state, batch, step_rng
                )
                self.step += 1
                # host batch is the per-process slice; examples/sec is
                # global. Count actual examples, not the leading dim of an
                # arbitrary array (documents carry B*(1+negatives) rows;
                # packed batches carry row-matrix + per-pair arrays)
                for key in (
                    "query_pair_index",  # packed: one entry per pair
                    "query_input_ids",
                    "input_ids",
                    "pixel_values",
                ):
                    if key in arrays:
                        n_examples = arrays[key].shape[0]
                        break
                else:
                    n_examples = next(iter(arrays.values())).shape[0]
                examples += n_examples * jax.process_count()
                if meta.get("lang"):
                    # per-language running mean (reference mmlm.py:145-160):
                    # keep the unfetched device scalars; one stacked transfer
                    # happens at log time, so no per-step sync
                    lang_losses.setdefault(meta["lang"], []).append(metrics["loss"])
                if self.ema_params is not None:
                    self.ema_params = self._ema_update(self.ema_params, self.params)

                if self.step % ta.log_lr_every == 0:
                    now = time.time()
                    metrics = dict(metrics)
                    metrics["lr"] = self.schedule(self.step)
                    metrics["examples_per_sec"] = examples / (now - last_log)
                    if meta.get("dataset_name"):
                        ds = meta["dataset_name"]
                        if "accuracy" in metrics:
                            metrics[f"accuracy/{ds}"] = metrics.pop("accuracy")
                    for lang, vals in lang_losses.items():
                        metrics[f"loss/{lang}"] = float(jnp.mean(jnp.stack(vals)))
                    lang_losses.clear()
                    self.tracker.log(metrics, self.step)
                    last_log = now
                    examples = 0

                if ta.save_every and self.step % ta.save_every == 0 and ta.output_dir:
                    self.save_state(ta.output_dir, self.step)

                eval_due = (
                    ta.eval_strategy == "steps"
                    and ta.eval_steps
                    and self.step % ta.eval_steps == 0
                ) or (
                    ta.eval_strategy == "epochs"
                    and self.steps_per_epoch
                    and self.step % self.steps_per_epoch == 0
                )
                if eval_due:
                    eval_metrics = self.eval_loop(self.step)
                    if eval_metrics:
                        # host-side eval numbers are per-process; train-step
                        # metrics are already global (GSPMD loss on global
                        # arrays — no gather needed, unlike ref base.py:485-498)
                        from contrastors_tpu.utils.dist import process_allmean

                        self.tracker.log(process_allmean(eval_metrics), self.step)

                if ta.profile and self.step >= 10:
                    break

        if ta.profile:
            jax.profiler.stop_trace()
            print(f"[trainer] profile written to {profile_dir}")
        if ta.output_dir:
            self.save_state(ta.output_dir, self.step)
        wait_pending_saves()  # the final checkpoint must be durable at exit
        self.tracker.finish()
        return self.step
