"""All shipped train recipes must parse into a valid Config."""

import glob

import pytest

from contrastors_tpu.read import read_config

RECIPES = sorted(glob.glob("configs/train/*.yaml"))


@pytest.mark.parametrize("path", RECIPES)
def test_recipe_parses(path):
    cfg = read_config(path)
    assert cfg.train_args.learning_rate > 0
    margs = cfg.model_args or cfg.text_model_args
    assert margs is not None and margs.model_type


def test_recipes_cover_all_trainers():
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    types = set()
    for path in RECIPES:
        cfg = read_config(path)
        types.add((cfg.model_args or cfg.text_model_args).model_type)
    # every recipe's model_type resolves to a registered trainer
    assert types <= set(TRAINER_REGISTRY)
    # the core families are represented
    assert {"encoder", "mlm", "mmlm", "glue", "locked_text", "distill"} <= types
