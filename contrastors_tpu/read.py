"""YAML -> Config loader (reference: src/contrastors/read.py:5-12)."""

from pathlib import Path
from typing import Union

import yaml

from contrastors_tpu.config import Config


def read_config(path: Union[str, Path]) -> Config:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Config(**raw)
