"""Trainer registry (reference: trainers/__init__.py:9-17)."""

from contrastors_tpu.trainers.base import BaseTrainer  # noqa: F401
from contrastors_tpu.trainers.text_text import TextTextTrainer  # noqa: F401
from contrastors_tpu.trainers.mlm import MLMTrainer  # noqa: F401


def _lazy(name):
    def build(config, dtype):
        if name == "glue":
            from contrastors_tpu.trainers.glue import GlueTrainer as cls
        elif name in ("clip", "locked_text"):
            from contrastors_tpu.trainers.image_text import ImageTextTrainer as cls
        elif name == "distill":
            from contrastors_tpu.trainers.distill import DistillTrainer as cls
        elif name == "mmlm":
            from contrastors_tpu.trainers.mmlm import MMLMTrainer as cls
        else:
            raise KeyError(name)
        return cls(config, dtype)

    return build


TRAINER_REGISTRY = {
    "mlm": MLMTrainer,
    "encoder": TextTextTrainer,
    "mmlm": _lazy("mmlm"),
    "glue": _lazy("glue"),
    "clip": _lazy("clip"),
    "locked_text": _lazy("locked_text"),
    "distill": _lazy("distill"),
}
