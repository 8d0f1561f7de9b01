"""Sequence packing: collator geometry + packed-vs-padded model parity
(beyond-reference capability; data/packing.py contract)."""

import numpy as np
import jax
import jax.numpy as jnp

from contrastors_tpu.data.packing import pack_tokenized, packing_efficiency
from contrastors_tpu.models.biencoder import BiEncoder
from contrastors_tpu.models.presets import nomic_bert_2048


def make_tokenized(rng, B=8, L=64, vocab=250, min_len=5):
    lengths = rng.integers(min_len, L + 1, size=B)
    ids = np.zeros((B, L), np.int32)
    mask = np.zeros((B, L), np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(5, vocab, size=n)
        mask[i, :n] = 1
    return ids, mask


def test_pack_tokenized_geometry():
    rng = np.random.default_rng(0)
    ids, mask = make_tokenized(rng, B=8, L=64)
    packed = pack_tokenized(ids, mask, row_len=128, max_segments=4)
    R = 2  # ceil(8 / 4)
    assert packed["input_ids"].shape == (R, 128)
    assert packed["pair_index"].shape == (8,)
    # flat slots are unique and in range
    assert len(set(packed["pair_index"].tolist())) == 8
    assert packed["pair_index"].max() < R * 4

    # every sequence's tokens are recoverable from its slot
    for i in range(8):
        flat = int(packed["pair_index"][i])
        r, s = divmod(flat, 4)
        sel = packed["segment_ids"][r] == (s + 1)
        n = int(mask[i].sum())
        got = packed["input_ids"][r][sel]
        assert len(got) == n, f"seq {i} truncated unexpectedly"
        np.testing.assert_array_equal(got, ids[i, :n])
        # positions restart at 0 within the segment
        np.testing.assert_array_equal(packed["position_ids"][r][sel], np.arange(n))

    assert packing_efficiency(mask, 128, 4) > 1.0


def test_pack_truncates_only_when_overfull():
    rng = np.random.default_rng(1)
    B, L = 6, 64
    ids = np.ones((B, L), np.int32)
    mask = np.ones((B, L), np.int32)  # all full-length: 6*64 tokens into 2*100
    packed = pack_tokenized(ids, mask, row_len=100, max_segments=3)
    # capacity 200 < 384: some truncation, but every slot assigned uniquely
    assert len(set(packed["pair_index"].tolist())) == B
    assert (packed["segment_ids"].max(axis=1) <= 3).all()


def test_packed_matches_padded_embeddings():
    """Packed forward == padded forward per pair (rotary flagship geometry,
    fp32): attention within segments + per-segment mean + restarting
    positions must reproduce the per-sequence computation exactly."""
    cfg = nomic_bert_2048(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_inner=128, attn_impl="sdpa"
    )
    model = BiEncoder(config=cfg, pooling="mean", dtype=jnp.float32)

    rng = np.random.default_rng(2)
    ids, mask = make_tokenized(rng, B=8, L=48)
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))

    padded = model.apply(params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))[
        "embedding"
    ]

    packed = pack_tokenized(ids, mask, row_len=128, max_segments=4)
    out = model.apply(
        params,
        input_ids=jnp.asarray(packed["input_ids"]),
        segment_ids=jnp.asarray(packed["segment_ids"]),
        position_ids=jnp.asarray(packed["position_ids"]),
        pair_index=jnp.asarray(packed["pair_index"]),
        max_segments=4,
    )["embedding"]

    np.testing.assert_allclose(np.asarray(out), np.asarray(padded), atol=3e-5, rtol=1e-4)


def test_packed_matches_padded_absolute_positions():
    """Same parity for an absolute-position BERT trunk (positions restart
    per segment through BertEmbeddings)."""
    from contrastors_tpu.models.presets import bert_base

    cfg = bert_base(
        vocab_size=256, n_positions=128, n_embd=64, n_layer=2, n_head=4, n_inner=128,
        attn_impl="sdpa",
    )
    model = BiEncoder(config=cfg, pooling="mean", dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids, mask = make_tokenized(rng, B=6, L=32)
    params = model.init(jax.random.PRNGKey(1), input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    padded = model.apply(params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))[
        "embedding"
    ]
    packed = pack_tokenized(ids, mask, row_len=96, max_segments=3)
    out = model.apply(
        params,
        input_ids=jnp.asarray(packed["input_ids"]),
        segment_ids=jnp.asarray(packed["segment_ids"]),
        position_ids=jnp.asarray(packed["position_ids"]),
        pair_index=jnp.asarray(packed["pair_index"]),
        max_segments=3,
    )["embedding"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(padded), atol=3e-5, rtol=1e-4)


def test_packed_grad_cache_matches_naive():
    """GradCache over packed rows == naive full-batch packed loss grads
    (extends the grad-cache equivalence guarantee to the packed path)."""
    from contrastors_tpu.grad_cache import grad_cache_loss_and_grads
    from contrastors_tpu.losses import clip_loss

    cfg = nomic_bert_2048(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_inner=128, attn_impl="sdpa"
    )
    model = BiEncoder(config=cfg, pooling="mean", dtype=jnp.float32)
    rng = np.random.default_rng(5)
    K, L = 4, 96
    q_ids, q_mask = make_tokenized(rng, B=16, L=32)
    d_ids, d_mask = make_tokenized(rng, B=16, L=48)
    from contrastors_tpu.data.packing import pack_tokenized

    qp = pack_tokenized(q_ids, q_mask, L, K)
    dp = pack_tokenized(d_ids, d_mask, L, K)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.asarray(q_ids), attention_mask=jnp.asarray(q_mask)
    )
    scale = lambda x: x * 20.0

    def slots(p, b, _rng):
        out = model.apply(
            p, input_ids=b["input_ids"], segment_ids=b["segment_ids"],
            position_ids=b["position_ids"], max_segments=K,
        )
        return {"embedding": out["embedding"]}

    q_idx = jnp.asarray(qp["pair_index"])
    d_idx = jnp.asarray(dp["pair_index"])

    def loss_slots(q_s, d_s):
        return clip_loss(q_s[q_idx], d_s[d_idx], scale)[0]

    qb = {k: jnp.asarray(qp[k]) for k in ("input_ids", "segment_ids", "position_ids")}
    db = {k: jnp.asarray(dp[k]) for k in ("input_ids", "segment_ids", "position_ids")}
    gc_loss, gc_grads = grad_cache_loss_and_grads(
        params, qb, db, slots, slots, loss_slots, chunk_size=2
    )

    def naive(p):
        q_s = slots(p, qb, None)["embedding"]
        d_s = slots(p, db, None)["embedding"]
        return loss_slots(q_s, d_s)

    n_loss, n_grads = jax.value_and_grad(naive)(params)
    np.testing.assert_allclose(float(gc_loss), float(n_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gc_grads), jax.tree_util.tree_leaves(n_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_packed_decoder_last_pooling_matches_padded():
    """Decoder trunk + packed rows: causal attention stays within segments
    and per-segment last-token pooling matches the padded run."""
    from contrastors_tpu.models.model_config import TrunkConfig

    cfg = TrunkConfig(
        vocab_size=256, n_positions=0, n_embd=64, n_layer=2, n_head=4, n_inner=128,
        activation_function="gelu", rotary_emb_fraction=0.25, causal=True,
        pad_token_id=0, attn_impl="sdpa",
    )
    model = BiEncoder(config=cfg, trunk_type="decoder", pooling="last", dtype=jnp.float32)
    rng = np.random.default_rng(7)
    ids, mask = make_tokenized(rng, B=6, L=40)
    params = model.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    padded = model.apply(params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))[
        "embedding"
    ]

    packed = pack_tokenized(ids, mask, row_len=120, max_segments=3)  # 3*40 fits
    assert int((packed["segment_ids"] > 0).sum()) == int(mask.sum())  # no truncation
    out = model.apply(
        params,
        input_ids=jnp.asarray(packed["input_ids"]),
        segment_ids=jnp.asarray(packed["segment_ids"]),
        position_ids=jnp.asarray(packed["position_ids"]),
        last_token_index=jnp.asarray(packed["last_token_index"]),
        max_segments=3,
    )["embedding"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(padded), atol=3e-5, rtol=1e-4)


def test_zero_token_truncation_points_at_pad_slot():
    """A sequence truncated to 0 tokens must NOT alias another sample's
    last token under 'last' pooling (round-3 review #4): its
    last_token_index lands on a genuine pad slot."""
    from contrastors_tpu.data.packing import pack_tokenized

    # rows 0/1 byte-full with free slots, row 2 slot-full with pad bytes:
    # the trailing 1-token sequence lands 0-token in a full row while a
    # genuine pad slot exists in row 2
    ids = np.zeros((5, 8), np.int32)
    mask = np.zeros((5, 8), np.int32)
    lens = [8, 8, 3, 3, 1]
    for i, n in enumerate(lens):
        ids[i, :n] = np.arange(1, n + 1) + 10 * i
        mask[i, :n] = 1
    packed = pack_tokenized(ids, mask, row_len=8, max_segments=2)
    flat_seg = packed["segment_ids"].reshape(-1)
    zero_seqs = []
    for i in range(5):
        seg = packed["pair_index"][i] % 2 + 1
        row = packed["pair_index"][i] // 2
        if int((packed["segment_ids"][row] == seg).sum()) == 0:
            zero_seqs.append(i)
            lti = int(packed["last_token_index"][i])
            assert flat_seg[lti] == 0, "0-token sequence must gather a pad slot"
    assert zero_seqs, "geometry should have produced a 0-token truncation"

    # model-level guarantee covers even the no-pad-slot-anywhere case:
    # packed 'last' pooling zeroes the embedding of a 0-token segment
    from contrastors_tpu.models.model_config import TrunkConfig

    cfg = TrunkConfig(
        vocab_size=256, n_positions=0, n_embd=32, n_layer=1, n_head=2, n_inner=64,
        activation_function="gelu", rotary_emb_fraction=0.25, causal=True,
        pad_token_id=0, attn_impl="sdpa",
    )
    model = BiEncoder(config=cfg, trunk_type="decoder", pooling="last", dtype=jnp.float32)
    ids2 = np.ones((4, 4), np.int32)
    mask2 = np.ones((4, 4), np.int32)  # 16 tokens into 2 rows x 4: rows ALL full
    p2 = pack_tokenized(ids2, mask2, row_len=4, max_segments=2)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(p2["input_ids"]),
        segment_ids=jnp.asarray(p2["segment_ids"]),
        position_ids=jnp.asarray(p2["position_ids"]),
        pair_index=jnp.asarray(p2["pair_index"]),
        last_token_index=jnp.asarray(p2["last_token_index"]),
        max_segments=2,
    )
    out = model.apply(
        params,
        input_ids=jnp.asarray(p2["input_ids"]),
        segment_ids=jnp.asarray(p2["segment_ids"]),
        position_ids=jnp.asarray(p2["position_ids"]),
        pair_index=jnp.asarray(p2["pair_index"]),
        last_token_index=jnp.asarray(p2["last_token_index"]),
        max_segments=2,
        normalize=False,
    )["embedding"]
    flat_seg2 = p2["segment_ids"].reshape(-1)
    for i in range(4):
        seg = p2["pair_index"][i] % 2 + 1
        row = p2["pair_index"][i] // 2
        if int((p2["segment_ids"][row] == seg).sum()) == 0:
            np.testing.assert_array_equal(np.asarray(out[i]), 0.0)
