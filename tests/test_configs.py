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


def test_every_model_type_is_registered():
    """Every validator-accepted model_type dispatches to a trainer — guards
    against the round-1 bug where 'clip' was registered but unreachable."""
    from contrastors_tpu.config import _MODEL_TYPES
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    assert set(_MODEL_TYPES) == set(TRAINER_REGISTRY)


DATA_SPECS = sorted(glob.glob("configs/data/*.yaml"))


@pytest.mark.parametrize("path", DATA_SPECS)
def test_data_spec_parses(path):
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    assert spec["datasets"], path
    for ds in spec["datasets"]:
        assert ds["name"] and ds["bucket"]
        assert ds["objective"]["type"] in ("paired", "triplet")
        assert len(ds["objective"]["columns"]) >= 2


def test_reference_yaml_aliases(tmp_path):
    """Reference recipes spell some keys differently (top_k,
    contrastive_data_args) — they must land on the right fields."""
    recipe = tmp_path / "r.yaml"
    recipe.write_text(
        """
train_args:
  learning_rate: 1.0e-4
model_args:
  model_type: encoder
  num_experts: 8
  top_k: 2
contrastive_data_args:
  input_shards: configs/data/contrastive_pretrain.yaml
  batch_size: 64
"""
    )
    cfg = read_config(recipe)
    assert cfg.model_args.moe_top_k == 2
    assert cfg.data_args is not None and cfg.data_args.batch_size == 64


REFERENCE_RECIPES = sorted(glob.glob("/root/reference/src/contrastors/configs/train/*.yaml"))


@pytest.mark.skipif(not REFERENCE_RECIPES, reason="reference checkout not present")
@pytest.mark.parametrize("path", REFERENCE_RECIPES)
def test_reference_recipe_parses_unchanged(path):
    """Stated compat goal: the reference's own 17 YAML recipes parse."""
    cfg = read_config(path)
    assert (cfg.model_args or cfg.text_model_args) is not None


def test_clip_model_type_parses():
    from contrastors_tpu.config import ModelArgs

    assert ModelArgs(model_type="clip").model_type == "clip"
    with pytest.raises(ValueError):
        ModelArgs(model_type="image_text")


def test_attn_impl_typo_rejected():
    """A typo'd attn_impl previously fell through to the SDPA path
    silently — it must be a config error."""
    import pytest

    from contrastors_tpu.config import ModelArgs

    with pytest.raises(Exception, match="attn_impl"):
        ModelArgs(model_type="encoder", model_name="x", attn_impl="pallas")
    for ok in ("flash", "sdpa", "flash_always"):
        ModelArgs(model_type="encoder", model_name="x", attn_impl=ok)


def test_matryoshka_weights_length_mismatch_rejected():
    import pytest

    from contrastors_tpu.config import TrainArgs

    with pytest.raises(Exception, match="matryoshka_loss_weights"):
        TrainArgs(
            learning_rate=1e-4, output_dir="/tmp/x",
            matryoshka_dims=[768, 512, 256], matryoshka_loss_weights=[1.0, 1.0],
        )
    TrainArgs(
        learning_rate=1e-4, output_dir="/tmp/x",
        matryoshka_dims=[768, 512], matryoshka_loss_weights=[1.0, 1.0],
    )
