"""Multilingual MLM trainer (model_type: mmlm).

TPU counterpart of the reference MMLMTrainer + DistributedIterableMLMDataset
(reference: trainers/mmlm.py:55-160, dataset/multilingual.py:110-289):
per-language directories of pre-tokenized Arrow data, language picked per
step with alpha=0.3 temperature sampling over corpus sizes, every rank
slicing its window of a GLOBAL batch from the same language (consistent
batches), and per-language loss logging.
"""

import os
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contrastors_tpu.trainers.mlm import MLMTrainer, mlm_mask

SAMPLING_ALPHA = 0.3


class MultilingualSampler:
    """alpha-temperature language sampling (reference multilingual.py:166-172)."""

    def __init__(self, sizes: Dict[str, int], alpha: float = SAMPLING_ALPHA, seed: int = 42):
        self.langs = sorted(sizes)
        p = np.asarray([sizes[l] for l in self.langs], dtype=np.float64)
        p = p / p.sum()
        p = p**alpha
        self.probs = p / p.sum()
        self.rng = np.random.default_rng(seed)

    def next_lang(self) -> str:
        return str(self.rng.choice(self.langs, p=self.probs))


class MMLMTrainer(MLMTrainer):
    def get_dataloaders(self):
        dargs = self.config.data_args
        from datasets import load_from_disk

        root = dargs.tokenized_dataset
        langs = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        datasets = {l: load_from_disk(os.path.join(root, l)) for l in langs}
        datasets = {l: (d["train"] if hasattr(d, "keys") and "train" in d else d) for l, d in datasets.items()}
        sizes = {l: len(d) for l, d in datasets.items()}
        if getattr(dargs, "sample_by_reference_lengths", False):
            # recipe-faithful mix: sample by the published corpus sizes
            # (reference dataset/constants.py:2013 via multilingual.py:160)
            # for whichever languages are present locally
            from contrastors_tpu.data.constants import reference_multilingual_lengths

            ref = reference_multilingual_lengths()
            missing = sorted(l for l in sizes if l not in ref)
            if missing:
                # a typo'd/extra language directory must be visible, not
                # silently sampled at its local corpus size while the rest
                # use the published sizes (ADVICE r3)
                print(
                    f"[mmlm] languages {missing} absent from the reference "
                    f"length table; sampling them by LOCAL corpus size",
                    flush=True,
                )
            sample_sizes = {l: ref.get(l, n) for l, n in sizes.items()}
        else:
            sample_sizes = sizes
        sampler = MultilingualSampler(sample_sizes, seed=dargs.seed)

        self._val = None
        batch = dargs.batch_size
        rank, world = self.process_index, jax.process_count()
        rank_batch = batch // world
        tok = self.tokenizer
        special = set(tok.all_special_ids)
        mlm_prob = dargs.mlm_prob
        rng = np.random.default_rng(dargs.seed + 1)
        cursors = {l: 0 for l in langs}

        total = sum(sizes.values())
        steps = total // batch

        def iterate():
            for _ in range(steps):
                lang = sampler.next_lang()
                ds = datasets[lang]
                start = cursors[lang]
                if start + batch > len(ds):
                    if batch >= len(ds):
                        # corpus smaller than a global batch: rotate the
                        # cursor so successive windows cover different rows
                        start = start % len(ds)
                    else:
                        start = 0
                cursors[lang] = start + batch
                # global window, then this rank's slice (multilingual.py:201-207);
                # modulo handles corpora smaller than the global batch (the
                # window wraps instead of indexing past the end)
                lo = start + rank * rank_batch
                rows = ds[[i % len(ds) for i in range(lo, lo + rank_batch)]]
                ids = np.asarray(rows["input_ids"], dtype=np.int32)
                masked, labels = mlm_mask(ids, mlm_prob, tok.mask_token_id, len(tok), special, rng)
                yield {
                    "lang": lang,
                    "input_ids": masked,
                    "attention_mask": np.asarray(
                        rows.get("attention_mask", np.ones_like(ids)), dtype=np.int32
                    ),
                    "labels": labels.astype(np.int32),
                }

        class _Loader:
            def __iter__(self):
                return iterate()

        return _Loader(), steps

