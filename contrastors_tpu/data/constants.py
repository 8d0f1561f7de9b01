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
