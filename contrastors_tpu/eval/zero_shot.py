"""Zero-shot image classification via prompt-ensembled text classifier
weights (reference: eval/zero_shot.py + eval/imagenet/imagenet.py:25-101).

The classifier weight for each class is the mean of the text tower's
normalized embeddings over a prompt ensemble (the CLIP-paper 7-prompt
subset, which tracks the full 80-template ensemble within ~0.1 top-1).
"""

from typing import Callable, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.eval.metrics import topk_accuracy

# CLIP's distilled 7-prompt ensemble + the plain photo prompt.
PROMPT_TEMPLATES = [
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
    "a photo of a {}.",
]


def zeroshot_classifier_weights(
    encode_text: Callable[[List[str]], np.ndarray],
    classnames: List[str],
    templates: Optional[List[str]] = None,
    batch_size: int = 256,
) -> np.ndarray:
    """encode_text(list of strings) -> [N, D] normalized embeddings.
    Returns [num_classes, D] classifier weights."""
    templates = templates or PROMPT_TEMPLATES
    weights = []
    prompts = [t.format(c) for c in classnames for t in templates]
    embs = []
    for start in range(0, len(prompts), batch_size):
        embs.append(np.asarray(encode_text(prompts[start : start + batch_size])))
    embs = np.concatenate(embs).reshape(len(classnames), len(templates), -1)
    w = embs.mean(axis=1)
    w /= np.linalg.norm(w, axis=-1, keepdims=True) + 1e-12
    return w


def evaluate_imagenet(
    encode_image: Callable[[np.ndarray], np.ndarray],
    classifier_weights: np.ndarray,
    batches: Iterator[dict],
) -> dict:
    """Top-1/5 accuracy over {pixel_values, labels} batches
    (reference imagenet.py:25-101)."""
    logits_all, labels_all = [], []
    for batch in batches:
        img = np.asarray(encode_image(batch["pixel_values"]))
        logits_all.append(img @ classifier_weights.T)
        labels_all.append(batch["labels"])
    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    acc = topk_accuracy(logits, labels, ks=(1, 5))
    return {"imagenet_zeroshot_top1": acc[1], "imagenet_zeroshot_top5": acc[5]}
