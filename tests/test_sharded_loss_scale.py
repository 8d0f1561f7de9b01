"""SURVEY §7 hard part 8: the 16k-batch contrastive loss must stay SHARDED.

Reference contract (loss.py:100-132): each rank computes loss on its local
queries against the globally gathered document pool — the similarity matrix
is [local_q, global_d] per device and the towers are never re-encoded per
rank. Under pjit the grad-cache chunk loop (a sequential lax.map) cannot be
partitioned by GSPMD, which silently all-gathers the token arrays and
replicates the full computation on every device; the trainer therefore runs
the grad-cache step inside shard_map over "data" (trainers/text_text.py).

This test compiles the REAL grad-cache train step (bench geometry scaled
down: global 512 pairs over 8 devices = 64 pairs/chip, chunk 16) and proves
both properties:

  * HLO: the post-SPMD module contains the per-device [64, 512] logits dot,
    NO global [512, 512] logits tensor, and NO all-gather of the integer
    token arrays (i.e. no per-chip full-batch re-encode);
  * numerics: 8-device loss / accuracy / grad-norm == single-device naive
    full-batch values to float32 tolerance.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastors_tpu.trainers import TRAINER_REGISTRY

from test_trainer_e2e import base_config, make_checkpoint_dir, make_pairs_file

GLOBAL_B, LOCAL_B, SEQ, CHUNK, EMB = 512, 64, 16, 16, 64


@pytest.fixture(scope="module")
def gc_trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sharded_loss")
    ckpt = make_checkpoint_dir(tmp)
    data = make_pairs_file(tmp, n=GLOBAL_B)
    cfg = base_config(
        ckpt, data, str(tmp / "run"), grad_cache=True, chunk_size=CHUNK
    )
    cfg.data_args.batch_size = GLOBAL_B
    return TRAINER_REGISTRY["encoder"](cfg, "fp32")


def _batch(trainer):
    r = np.random.default_rng(0)
    mk = lambda seed: np.asarray(
        np.random.default_rng(seed).integers(5, 100, size=(GLOBAL_B, SEQ)), np.int32
    )
    ones = np.ones((GLOBAL_B, SEQ), np.int32)
    return {
        "query_input_ids": mk(1),
        "query_attention_mask": ones,
        "document_input_ids": mk(2),
        "document_attention_mask": ones,
    }


def _naive_reference(trainer, arrays, rng):
    """Single-device full-batch loss/grads on the same params — the gold the
    sharded chunked step must reproduce."""
    import optax

    params = jax.device_get(trainer.params)
    dev0 = jax.devices()[0]
    params = jax.device_put(params, dev0)
    b = {k: jax.device_put(jnp.asarray(v), dev0) for k, v in arrays.items()}

    from contrastors_tpu.losses import clip_loss

    def loss_fn(p):
        q = trainer.biencoder.apply(
            p["model"], input_ids=b["query_input_ids"],
            attention_mask=b["query_attention_mask"],
        )["embedding"]
        d = trainer.biencoder.apply(
            p["model"], input_ids=b["document_input_ids"],
            attention_mask=b["document_attention_mask"],
        )["embedding"]
        loss, acc = clip_loss(
            q, d, lambda x: trainer.logit_scale.apply(p["logit_scale"], x)
        )
        return loss, acc

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return float(loss), float(acc), float(optax.global_norm(grads))


def test_hard_part_8_sharded_equals_naive(gc_trainer):
    from contrastors_tpu.parallel import shard_batch

    assert gc_trainer.mesh.shape["data"] == 8
    arrays = _batch(gc_trainer)
    train_step = gc_trainer.make_train_step()
    rng = jax.random.PRNGKey(7)

    ref_loss, ref_acc, ref_gnorm = _naive_reference(gc_trainer, arrays, rng)

    params = jax.device_get(gc_trainer.params)
    opt_state = jax.device_get(gc_trainer.opt_state)
    from contrastors_tpu.parallel.mesh import replicate

    with gc_trainer.mesh:
        p8 = replicate(params, gc_trainer.mesh)
        o8 = replicate(opt_state, gc_trainer.mesh)
        b8 = shard_batch(arrays, gc_trainer.mesh)
        _, _, metrics = train_step(p8, o8, b8, rng)
        loss8 = float(metrics["loss"])
        acc8 = float(metrics["accuracy"])
        gnorm8 = float(metrics["grad_norm"])

    np.testing.assert_allclose(loss8, ref_loss, atol=5e-6, rtol=1e-6)
    np.testing.assert_allclose(acc8, ref_acc, atol=1e-6)
    np.testing.assert_allclose(gnorm8, ref_gnorm, rtol=1e-4)


def test_hard_part_8_logits_stay_sharded_in_hlo(gc_trainer):
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate

    arrays = _batch(gc_trainer)
    train_step = gc_trainer.make_train_step()
    rng = jax.random.PRNGKey(7)
    params = jax.device_get(gc_trainer.params)
    opt_state = jax.device_get(gc_trainer.opt_state)
    with gc_trainer.mesh:
        p8 = replicate(params, gc_trainer.mesh)
        o8 = replicate(opt_state, gc_trainer.mesh)
        b8 = shard_batch(arrays, gc_trainer.mesh)
        hlo = train_step.lower(p8, o8, b8, rng).compile().as_text()

    # the logits matrix is data-sharded: [local_q=64, global_d=512] exists,
    # the global [512, 512] matrix does not (in any dtype)
    assert re.search(r"f32\[64,512\]", hlo), "per-device [local_q, global_d] logits not found"
    assert not re.search(r"\[512,512\]", hlo), "global logits matrix materialized per device"

    # no device re-encodes the full batch: the integer token arrays are never
    # all-gathered (under pjit-global this is exactly what GSPMD does to the
    # lax.map chunk loop), and no full-batch activation [512, 16, ...] exists
    token_gathers = [
        line for line in hlo.splitlines()
        if "all-gather" in line and re.search(r"= [su]\d+\[", line)
    ]
    assert not token_gathers, f"token arrays all-gathered: {token_gathers[:3]}"
    assert not re.search(r"\[512,16,", hlo), "full-batch activation materialized per device"
    assert not re.search(r"\[512,16\]", hlo), "full-batch token array materialized per device"

    # embeddings DO cross the ICI: at least one f32 all-gather (the document
    # pool for the loss), none of them logits-sized
    emb_gathers = [
        line for line in hlo.splitlines() if re.search(r"= f32\[\d+,64\]\{[^}]*\} all-gather", line)
    ]
    assert emb_gathers, "expected an embedding all-gather for the document pool"


# -- packed grad-cache: the flagship pretrain execution mode must shard too --
# (VERDICT r3 #1: packed rows pack per-device on the host with LOCAL pair
# indices; the step runs in shard_map, so the chunk loop never replicates)

PK_SEG, PK_ROWLEN = 4, 4 * SEQ  # 4 full-length segments per row: lossless
PK_ROWS_LOCAL = GLOBAL_B // 8 // PK_SEG  # 16 rows per device


@pytest.fixture(scope="module")
def packed_gc_trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sharded_packed")
    ckpt = make_checkpoint_dir(tmp)
    data = make_pairs_file(tmp, n=GLOBAL_B)
    cfg = base_config(
        ckpt, data, str(tmp / "run"), grad_cache=True, chunk_size=CHUNK
    )
    cfg.data_args.batch_size = GLOBAL_B
    cfg.data_args.packed = True
    cfg.data_args.packed_max_segments = PK_SEG
    cfg.data_args.packed_seq_len = PK_ROWLEN
    return TRAINER_REGISTRY["encoder"](cfg, "fp32")


def _packed_setup(trainer):
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate

    arrays = _batch(trainer)
    host = trainer.transform_host_batch(dict(arrays))
    assert host["query_input_ids"].shape == (GLOBAL_B // PK_SEG, PK_ROWLEN)
    # per-device groups: indices are LOCAL (every device's slice addresses
    # its own [rows_local * K] slot matrix)
    pair = host["query_pair_index"].reshape(8, -1)
    assert pair.max() < PK_ROWS_LOCAL * PK_SEG
    train_step = trainer.make_train_step()
    params = jax.device_get(trainer.params)
    opt_state = jax.device_get(trainer.opt_state)
    with trainer.mesh:
        p8 = replicate(params, trainer.mesh)
        o8 = replicate(opt_state, trainer.mesh)
        b8 = shard_batch(
            {k: v for k, v in host.items() if isinstance(v, np.ndarray)}, trainer.mesh
        )
    return arrays, train_step, p8, o8, b8


def test_packed_grad_cache_sharded_equals_naive(packed_gc_trainer):
    arrays, train_step, p8, o8, b8 = _packed_setup(packed_gc_trainer)
    rng = jax.random.PRNGKey(7)
    # gold: single-device naive PADDED full batch (packing is lossless at
    # this geometry; packed==padded pooling is covered by test_packing)
    ref_loss, ref_acc, ref_gnorm = _naive_reference(packed_gc_trainer, arrays, rng)
    with packed_gc_trainer.mesh:
        _, _, metrics = train_step(p8, o8, b8, rng)
        loss8, acc8, gnorm8 = (
            float(metrics["loss"]), float(metrics["accuracy"]), float(metrics["grad_norm"])
        )
    np.testing.assert_allclose(loss8, ref_loss, atol=5e-6, rtol=1e-6)
    np.testing.assert_allclose(acc8, ref_acc, atol=1e-6)
    np.testing.assert_allclose(gnorm8, ref_gnorm, rtol=1e-4)


def test_packed_grad_cache_logits_stay_sharded_in_hlo(packed_gc_trainer):
    _, train_step, p8, o8, b8 = _packed_setup(packed_gc_trainer)
    with packed_gc_trainer.mesh:
        hlo = train_step.lower(p8, o8, b8, jax.random.PRNGKey(7)).compile().as_text()

    # per-device [local_q=64, global_d=512] logits exist; global [512,512] not
    assert re.search(r"f32\[64,512\]", hlo), "per-device packed logits not found"
    assert not re.search(r"\[512,512\]", hlo), "global logits matrix materialized per device"

    # no token all-gather (integer arrays stay local to each device) and no
    # full row set per device: the global token grid is [128, 64]
    token_gathers = [
        line for line in hlo.splitlines()
        if "all-gather" in line and re.search(r"= [su]\d+\[", line)
    ]
    assert not token_gathers, f"token arrays all-gathered: {token_gathers[:3]}"
    assert not re.search(r"[su]\d+\[128,64\]", hlo), "full packed row set materialized per device"

    # embeddings DO cross the ICI (the document pool)
    emb_gathers = [
        line for line in hlo.splitlines()
        if re.search(r"= f32\[\d+,64\]\{[^}]*\} all-gather", line)
    ]
    assert emb_gathers, "expected an embedding all-gather for the document pool"
