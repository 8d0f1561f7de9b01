"""Dataset constants (reference: dataset/constants.py).

The ImageNet class-name list and folder mapping are the standard public
OpenAI-CLIP label data, stored as JSON alongside this module. Image
normalization constants live in data/transforms.py.
"""

import json
import os

_here = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(_here, "imagenet_classes.json")) as _f:
    _data = json.load(_f)

IMAGENET_CLASSNAMES = _data["imagenet_classnames"]
IMAGENET_FOLDER_TO_CLASS = _data["imagenet_folder_to_class"]


def reference_multilingual_lengths():
    """Per-language corpus sizes used by the reference's alpha-temperature
    sampler (reference: dataset/constants.py:2013 MULTILINGUAL_LENGTHS,
    consumed at dataset/multilingual.py:160). Bundled so sampling can match
    the published recipe even when only a subset of the corpora is local.
    """
    with open(os.path.join(_here, "multilingual_lengths.json")) as f:
        return json.load(f)["multilingual_lengths"]
