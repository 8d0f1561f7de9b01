"""CLI launcher (reference: src/contrastors/train.py:51-131).

Usage: python -m contrastors_tpu.train --config=configs/train/X.yaml \
           [--dtype=bf16] [--key=value overrides]

NCCL/DeepSpeed process-group setup (reference train.py:114-118) is replaced
by utils.dist.maybe_initialize_distributed(): set CONTRASTORS_TPU_MULTIHOST=1
on TPU pods (auto-detection), or JAX_COORDINATOR_ADDRESS + NUM_PROCESSES +
PROCESS_ID on CPU/GPU clusters; single-host runs need nothing. The mesh is
built inside BaseTrainer over all global devices.
"""

import argparse
import sys

from contrastors_tpu.read import read_config
from contrastors_tpu.trainers import TRAINER_REGISTRY


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="contrastors_tpu trainer")
    parser.add_argument("--config", required=True)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--learning_rate", type=float)
    parser.add_argument("--batch_size", type=int)
    parser.add_argument("--num_epochs", type=int)
    parser.add_argument("--num_train_steps", type=int)
    parser.add_argument("--output_dir")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--wandb", action="store_true", default=None)
    return parser.parse_args(argv)


def update_config_with_args(config, args):
    """CLI flags override matching fields in any arg group
    (reference train.py:87-94) — including the per-tower groups used by
    dual-encoder recipes (text_data_args/text_model_args/...)."""
    groups = (
        config.train_args,
        config.data_args,
        config.text_data_args,
        config.model_args,
        config.text_model_args,
        config.vision_model_args,
        config.tower_model_args,
    )
    for group in groups:
        if group is None:
            continue
        for key, value in vars(args).items():
            if value is not None and hasattr(group, key):
                setattr(group, key, value)
    return config


def main(argv=None):
    from contrastors_tpu.utils.compile_cache import enable as enable_compile_cache
    from contrastors_tpu.utils.dist import maybe_initialize_distributed

    maybe_initialize_distributed()
    enable_compile_cache()
    args = parse_args(argv)
    config = read_config(args.config)
    config = update_config_with_args(config, args)

    margs = config.model_args or config.text_model_args
    if margs is None:
        raise SystemExit(
            f"{args.config}: neither model_args nor text_model_args is set — "
            "check the config's top-level keys (unknown keys are ignored by "
            "the schema, so a typo like 'model_arg:' silently disappears)"
        )
    trainer_cls = TRAINER_REGISTRY[margs.model_type]
    trainer = trainer_cls(config, args.dtype)
    trainer.train()


if __name__ == "__main__":
    main()
