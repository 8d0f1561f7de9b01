"""YAML -> Config loader (reference: src/contrastors/read.py:5-12)."""

from pathlib import Path
from typing import Union

import yaml

from contrastors_tpu.config import Config


def read_config(path: Union[str, Path]) -> Config:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    # Some reference recipes (configs/train/contrastive_pretrain_pythia.yaml,
    # contrastive_finetune_decoder.yaml) use "contrastive_data_args" for the
    # data block; the reference Config silently drops it (pydantic extras),
    # leaving data_args=None. Treat it as an alias instead.
    if "contrastive_data_args" in raw and "data_args" not in raw:
        raw["data_args"] = raw.pop("contrastive_data_args")
    return Config(**raw)
