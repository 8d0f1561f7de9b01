"""Offline data-prep scripts: pretokenize packing, hard-negative mining,
consistency filtering, index building, tokenizer compare."""

import json

import numpy as np

from contrastors_tpu.scripts.pretokenize import pack_tokens
from contrastors_tpu.scripts.mine_hard_negatives import mine
from contrastors_tpu.scripts.consistency_filter import consistency_keep_mask
from contrastors_tpu.scripts.tokenizer_compare import compare


def test_pack_tokens():
    docs = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10, 11]]
    packed = list(pack_tokens(docs, max_length=4, sep_id=0))
    # stream: 1 2 3 0 4 5 0 6 7 8 9 10 11 0 -> 3 full windows
    assert packed == [[1, 2, 3, 0], [4, 5, 0, 6], [7, 8, 9, 10]]


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_mine_hard_negatives_excludes_positive_and_false_negs():
    rng = np.random.default_rng(0)
    d = _norm(rng.normal(size=(20, 8)).astype(np.float32))
    q = d.copy()  # query == its positive document embedding
    # make doc 1 a near-duplicate of doc 0 (false negative for query 0)
    d[1] = _norm(d[0] + 0.001 * rng.normal(size=8)).astype(np.float32)
    q[1] = d[1]
    negs = mine(q, d, positives=np.arange(20), num_negatives=3, margin=0.95)
    assert len(negs) == 20
    assert all(i not in negs[i] for i in range(20))
    assert 1 not in negs[0], "near-duplicate must be filtered as false negative"
    assert all(len(n) <= 3 for n in negs)


def test_consistency_filter_keeps_aligned_pairs():
    rng = np.random.default_rng(1)
    d = _norm(rng.normal(size=(32, 8)).astype(np.float32))
    q = d.copy()
    # corrupt 4 pairs: query matches a different document entirely
    for i in range(4):
        q[i] = d[(i + 16) % 32]
    keep = consistency_keep_mask(q, d, top_k=2)
    assert keep[4:].all(), "clean pairs must be kept"
    assert not keep[:4].any(), "misaligned pairs must be dropped"


def test_tokenizer_compare(tmp_path):
    from test_data import make_tokenizer

    tok = make_tokenizer(tmp_path)
    out = compare(tok, tok, ["word1 word2", "word3"])
    assert out["identical_tokenizations"] == 1.0
    assert out["vocab_jaccard"] == 1.0


def test_token_packer_no_tail_loss_across_batches():
    """One corpus-level buffer: windows must be identical whether documents
    arrive in one call or split across tokenizer batches (round-3 review
    #7: a per-call buffer dropped up to max_length-1 tokens per batch)."""
    from contrastors_tpu.scripts.pretokenize import TokenPacker

    docs = [[i, i + 1, i + 2] for i in range(0, 40, 3)]
    one_shot = list(pack_tokens(docs, max_length=8, sep_id=0))

    p = TokenPacker(max_length=8, sep_id=0)
    split = []
    for start in range(0, len(docs), 2):  # simulate 2-doc tokenizer batches
        split.extend(p.add(docs[start : start + 2]))
    assert split == one_shot
    assert len(split) >= 6


def test_vision_train_to_signal_world(tmp_path):
    """The vision train-to-signal corpus builder (scripts/
    vision_train_to_signal.py): renders are class-consistent and loadable
    through the real ImageTextDataset, prompts tokenize without [UNK]
    (the frozen tokenizer must map every zero_shot template word), and the
    held-out eval set covers every class."""
    from transformers import BertTokenizerFast

    from contrastors_tpu.data.image_text import ImageTextDataset
    from contrastors_tpu.eval.zero_shot import PROMPT_TEMPLATES
    from contrastors_tpu.scripts.vision_train_to_signal import (
        IMG, build_world, classnames, render, COLORS,
    )

    text_ckpt, vis_ckpt, pattern, ev_imgs, ev_labels = build_world(tmp_path, n_train=32)
    names = classnames()
    assert len(names) == 32
    assert ev_imgs.shape == (len(names) * 8, IMG, IMG, 3)
    assert set(ev_labels.tolist()) == set(range(len(names)))

    # every ensemble prompt tokenizes to known ids — no [UNK] collapse
    tok = BertTokenizerFast.from_pretrained(text_ckpt)
    prompts = [t.format(c) for c in names for t in PROMPT_TEMPLATES]
    enc = tok(prompts, padding=False)
    assert all(tok.unk_token_id not in ids for ids in enc["input_ids"])

    # renders carry their color: the shape's dominant pixel matches the class
    rng = np.random.default_rng(0)
    im = render(COLORS["red"], "square", rng)
    assert (im == np.asarray(COLORS["red"], np.uint8)).all(axis=-1).sum() > 50

    # the shards stream through the real loader at the training geometry
    ds = ImageTextDataset(
        pattern, global_batch_size=8, tokenizer=tok, image_size=IMG,
        seq_len=16, train_num_samples=16, shuffle_buffer=8,
    )
    b = next(iter(ds))
    assert b["pixel_values"].shape == (8, 3, IMG, IMG)
    assert b["input_ids"].shape == (8, 16)
