"""Image-text (CLIP/LiT) stack: tar pipeline, DualEncoder training, zero-shot
eval (reference: trainers/image_text.py, dataset/image_text_loader.py)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
import torch
from PIL import Image

from contrastors_tpu.config import Config
from contrastors_tpu.data.image_text import ImageTextDataset, get_imagenet, iter_tar_samples
from contrastors_tpu.trainers import TRAINER_REGISTRY

from test_trainer_e2e import make_checkpoint_dir


def make_vision_checkpoint(tmp_path):
    from transformers import ViTConfig, ViTModel
    from safetensors.torch import save_file

    torch.manual_seed(1)
    cfg = ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = ViTModel(cfg, add_pooling_layer=False)
    ckpt = tmp_path / "tiny-vit"
    ckpt.mkdir()
    cfg.save_pretrained(str(ckpt))
    save_file({k: v.contiguous() for k, v in model.state_dict().items()}, str(ckpt / "model.safetensors"))
    return str(ckpt)


def rand_image(rng, size=40):
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    return Image.fromarray(arr, "RGB")


def make_tar_shards(tmp_path, n_shards=2, per_shard=24):
    rng = np.random.default_rng(0)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    idx = 0
    for s in range(n_shards):
        with tarfile.open(shard_dir / f"shard-{s:04d}.tar", "w") as tf:
            for _ in range(per_shard):
                img = rand_image(rng)
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"word{idx % 30} word{(idx * 3) % 30}".encode()
                info = tarfile.TarInfo(f"{idx:06d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
                idx += 1
    return str(shard_dir / ("shard-{0000..%04d}.tar" % (n_shards - 1)))


def test_tar_iteration(tmp_path):
    pattern = make_tar_shards(tmp_path, n_shards=1, per_shard=5)
    path = pattern.replace("{0000..0000}", "0000")
    samples = list(iter_tar_samples(path))
    assert len(samples) == 5
    assert samples[0]["image"].size == (40, 40)
    assert samples[0]["text"].startswith("word")


def test_image_text_dataset(tmp_path):
    from test_data import make_tokenizer

    tok = make_tokenizer(tmp_path)
    pattern = make_tar_shards(tmp_path)
    ds = ImageTextDataset(
        pattern, global_batch_size=8, tokenizer=tok, image_size=32, seq_len=12,
        train_num_samples=32, shuffle_buffer=16,
    )
    batches = list(ds)
    assert len(batches) == 4
    b = batches[0]
    assert b["pixel_values"].shape == (8, 3, 32, 32)
    assert b["input_ids"].shape == (8, 12)


def test_imagenet_folder_loader(tmp_path):
    rng = np.random.default_rng(1)
    val = tmp_path / "val"
    for cls in ("n01", "n02"):
        (val / cls).mkdir(parents=True)
        for i in range(3):
            rand_image(rng).save(val / cls / f"{i}.jpg")
    batches = list(get_imagenet(str(val), image_size=32, batch_size=4))
    assert sum(b["pixel_values"].shape[0] for b in batches) == 6
    assert set(np.concatenate([b["labels"] for b in batches]).tolist()) == {0, 1}


def test_image_text_trainer(tmp_path):
    text_ckpt = make_checkpoint_dir(tmp_path)
    vis_ckpt = make_vision_checkpoint(tmp_path)
    shards = make_tar_shards(tmp_path)
    out = str(tmp_path / "run")

    cfg = Config(
        train_args=dict(
            num_epochs=1,
            num_train_steps=4,
            learning_rate=1e-3,
            weight_decay=0.0,
            warmup_steps=1,
            schedule_type="cosine",
            max_grad_norm=1.0,
            adam_beta1=0.9,
            adam_beta2=0.95,
            log_lr_every=2,
            log_grads_every=100,
            wandb=False,
            output_dir=out,
        ),
        data_args=dict(
            image_text_shards=shards,
            batch_size=8,
            eval_batch_size=8,
            seed=0,
            workers=0,
            shuffle=True,
            train_num_samples=48,
            dataset_resampled=False,
        ),
        model_args=dict(model_type="locked_text"),
        text_model_args=dict(
            model_type="locked_text",
            model_name=text_ckpt,
            pooling="mean",
            freeze=True,
            hamming=True,
            pretrained=True,
            seq_len=12,
            attn_impl="sdpa",
        ),
        vision_model_args=dict(
            model_type="locked_text",
            model_name=vis_ckpt,
            pooling="map",
            pretrained=True,
            logit_scale=None,
            trainable_logit_scale=True,
            attn_impl="sdpa",
        ),
        transforms=dict(image_size=32),
    )
    trainer = TRAINER_REGISTRY["locked_text"](cfg, "fp32")
    trainer.train()

    with open(os.path.join(out, "metrics.jsonl")) as f:
        metrics = [json.loads(l) for l in f]
    assert metrics and all(np.isfinite(m["loss"]) for m in metrics)
    assert "logit_scale" in metrics[-1]

    # frozen text tower must be unchanged after training
    import jax

    leaf = trainer.params["params"]["text"]["trunk"]["emb_ln"]["weight"]
    assert np.isfinite(np.asarray(leaf)).all()

    # vision tower export
    trainer.save_vision_tower(out)
    assert os.path.exists(os.path.join(out, "vision_tower"))


def test_flickr_retrieval_eval(tmp_path):
    text_ckpt = make_checkpoint_dir(tmp_path)
    vis_ckpt = make_vision_checkpoint(tmp_path)
    shards = make_tar_shards(tmp_path, n_shards=1, per_shard=16)

    cfg = Config(
        train_args=dict(
            num_epochs=1, num_train_steps=1, learning_rate=1e-3, weight_decay=0.0,
            warmup_steps=0, schedule_type="cosine", max_grad_norm=1.0,
            adam_beta1=0.9, adam_beta2=0.95, log_lr_every=1, log_grads_every=100,
            wandb=False, output_dir=str(tmp_path / "run"),
        ),
        data_args=dict(
            image_text_shards=shards, batch_size=8, eval_batch_size=8, seed=0,
            workers=0, shuffle=True, train_num_samples=16,
            eval_flickr=True, flickr_shards=shards.replace("{0000..0000}", "0000"),
        ),
        model_args=dict(model_type="locked_text"),
        text_model_args=dict(
            model_type="locked_text", model_name=text_ckpt, pooling="mean",
            freeze=True, pretrained=True, seq_len=12, attn_impl="sdpa",
        ),
        vision_model_args=dict(
            model_type="locked_text", model_name=vis_ckpt, pooling="map",
            pretrained=True, logit_scale=None, trainable_logit_scale=True, attn_impl="sdpa",
        ),
        transforms=dict(image_size=32),
    )
    trainer = TRAINER_REGISTRY["locked_text"](cfg, "fp32")
    metrics = trainer.eval_loop(0)
    assert "flickr/image_to_text_R@1" in metrics
    assert 0.0 <= metrics["flickr/image_to_text_R@5"] <= 1.0


def test_datacomp_zeroshot_and_aggregate(tmp_path):
    """DataComp-lite: wds classification shards -> zero-shot accuracy +
    aggregation (reference eval/datacomp/wds_eval.py, aggregate_scores.py)."""
    import tarfile as tf_mod
    from contrastors_tpu.eval.datacomp import (
        aggregate,
        iter_wds_classification,
        zeroshot_classification_task,
    )

    rng = np.random.default_rng(0)
    shard = tmp_path / "cls-0000.tar"
    with tf_mod.open(shard, "w") as tf:
        for i in range(8):
            img = rand_image(rng)
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tf_mod.TarInfo(f"{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"label": i % 2}).encode()
            info = tf_mod.TarInfo(f"{i:04d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    samples = list(iter_wds_classification(str(shard), image_size=32))
    assert len(samples) == 8
    assert {s[1] for s in samples} == {0, 1}

    # toy encoders: embedding = mean pixel stats / bag of characters
    def encode_image(px):
        flat = px.reshape(px.shape[0], -1)
        return flat[:, :16] / (np.linalg.norm(flat[:, :16], axis=1, keepdims=True) + 1e-6)

    def encode_text(texts):
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            out[i, hash(t) % 16] = 1.0
        return out

    res = zeroshot_classification_task(
        encode_image, encode_text, str(shard), ["cat", "dog"], image_size=32, batch_size=4
    )
    assert 0.0 <= res["acc1"] <= 1.0 and res["acc5"] == 1.0  # 2 classes -> top5 perfect

    agg = aggregate({"a": res, "b": {"image_to_text_R@1": 0.5, "text_to_image_R@1": 0.7}})
    assert agg["zeroshot_acc1"] == res["acc1"]
    assert abs(agg["retrieval_R@1"] - 0.6) < 1e-9


def test_unlocked_clip_trainer(tmp_path):
    """model_type 'clip' (both towers trainable — reference
    trainers/__init__.py:9-17) dispatches and trains; was unreachable from
    YAML in round 1 (_MODEL_TYPES listed 'image_text' instead)."""
    text_ckpt = make_checkpoint_dir(tmp_path)
    vis_ckpt = make_vision_checkpoint(tmp_path)
    shards = make_tar_shards(tmp_path, n_shards=1, per_shard=16)
    out = str(tmp_path / "run_clip")

    cfg = Config(
        train_args=dict(
            num_epochs=1, num_train_steps=2, learning_rate=1e-3, weight_decay=0.0,
            warmup_steps=1, schedule_type="cosine", max_grad_norm=1.0,
            adam_beta1=0.9, adam_beta2=0.95, log_lr_every=1, log_grads_every=100,
            wandb=False, output_dir=out,
        ),
        data_args=dict(
            image_text_shards=shards, batch_size=8, eval_batch_size=8, seed=0,
            workers=0, shuffle=True, train_num_samples=16,
        ),
        model_args=dict(model_type="clip"),
        text_model_args=dict(
            model_type="clip", model_name=text_ckpt, pooling="mean",
            freeze=False, pretrained=True, seq_len=12, attn_impl="sdpa",
        ),
        vision_model_args=dict(
            model_type="clip", model_name=vis_ckpt, pooling="map",
            pretrained=True, logit_scale=None, trainable_logit_scale=True, attn_impl="sdpa",
        ),
        transforms=dict(image_size=32),
    )
    trainer = TRAINER_REGISTRY["clip"](cfg, "fp32")
    before = np.asarray(trainer.params["params"]["text"]["trunk"]["emb_ln"]["weight"]).copy()
    trainer.train()
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["loss"]) for m in metrics)
    # unlocked: text tower must actually receive updates
    after = np.asarray(trainer.params["params"]["text"]["trunk"]["emb_ln"]["weight"])
    assert not np.allclose(before, after)


def test_caption_mlm_collator(tmp_path):
    """mlm_prob on the image-text dataset adds a masked caption view
    (reference image_text_loader.py:337-348 mmlm vision branch)."""
    from test_data import make_tokenizer

    tok = make_tokenizer(tmp_path)
    pattern = make_tar_shards(tmp_path, n_shards=1, per_shard=16)
    ds = ImageTextDataset(
        pattern, global_batch_size=8, tokenizer=tok, image_size=32, seq_len=12,
        train_num_samples=16, shuffle_buffer=0, mlm_prob=0.5,
    )
    b = next(iter(ds))
    assert b["mlm_input_ids"].shape == b["input_ids"].shape
    assert b["mlm_labels"].shape == b["input_ids"].shape
    masked = b["mlm_labels"] != -100
    assert masked.any(), "nothing was masked at prob 0.5"
    # unmasked positions keep their tokens; masked labels store originals
    np.testing.assert_array_equal(b["mlm_input_ids"][~masked], b["input_ids"][~masked])
    np.testing.assert_array_equal(b["mlm_labels"][masked], b["input_ids"][masked])


def test_grouped_zeroshot_fairness_metrics(tmp_path):
    """Fairness/WILDS task shape: grouped shards -> per-group, worst-group
    top-1, mean per-class recall (reference fairness_eval.py/wilds_eval.py)."""
    import tarfile as tf_mod
    from contrastors_tpu.eval.datacomp import grouped_zeroshot_task

    rng = np.random.default_rng(3)
    shard = tmp_path / "grp-0000.tar"
    with tf_mod.open(shard, "w") as tf:
        for i in range(12):
            img = rand_image(rng)
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tf_mod.TarInfo(f"{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"label": i % 2, "group": "africa" if i % 3 == 0 else "europe"}).encode()
            info = tf_mod.TarInfo(f"{i:04d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    def encode_image(px):
        flat = px.reshape(px.shape[0], -1)[:, :16]
        return flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-6)

    def encode_text(texts):
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            out[i, hash(t) % 16] = 1.0
        return out

    res = grouped_zeroshot_task(
        encode_image, encode_text, str(shard), ["cat", "dog"], image_size=32, batch_size=5
    )
    assert 0.0 <= res["acc1"] <= 1.0
    assert "acc1_group_africa" in res and "acc1_group_europe" in res
    assert res["worst_group_acc1"] == min(res["acc1_group_africa"], res["acc1_group_europe"])
    assert abs(res["group_gap_acc1"] - abs(res["acc1_group_africa"] - res["acc1_group_europe"])) < 1e-9
    assert 0.0 <= res["mean_per_class_recall"] <= 1.0

    from contrastors_tpu.eval.datacomp import aggregate

    agg = aggregate({"geode": res})
    assert agg["worst_group_acc1"] == res["worst_group_acc1"]


def test_winogavil_task(tmp_path):
    """WinoGAViL association instances -> Jaccard + per-set-size breakdown
    (reference eval/datacomp/wino_eval.py:39-109)."""
    import tarfile as tf_mod
    from contrastors_tpu.eval.datacomp import (
        aggregate,
        get_clip_prompt,
        iter_wds_wino,
        winogavil_task,
    )

    assert get_clip_prompt("elephant") == "An elephant"
    assert get_clip_prompt("Dog", prefix="classification") == "classification: A dog"

    # perfect-oracle encoders: image embedding = one-hot of its candidate
    # slot; cue text embedding = indicator over its true associations ->
    # top-n_assoc ranking recovers the association set exactly (Jaccard 1)
    rng = np.random.default_rng(7)
    dim = 16

    instances = []
    for size, n_assoc in ((5, 2), (6, 3), (10, 4), (12, 5)):
        mask = np.zeros(size, bool)
        mask[rng.choice(size, n_assoc, replace=False)] = True
        imgs = [np.eye(dim, dtype=np.float32)[i].reshape(1, 4, 4) for i in range(size)]
        instances.append((imgs, f"cue{size}", mask))

    truth_by_cue = {cue: mask for _, cue, mask in instances}

    def encode_image(px):
        return px.reshape(px.shape[0], -1)

    def encode_text(texts):
        out = np.zeros((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            cue = t.split()[-1]  # "A cue5" -> "cue5"
            mask = truth_by_cue[cue]
            out[i, : len(mask)] = mask.astype(np.float32)
        return out

    res = winogavil_task(encode_image, encode_text, instances=instances)
    assert res["avg_jaccard_score"] == 1.0
    for n in (5, 6, 10, 12):
        assert res[f"jaccard_score_{n}"] == 1.0
    assert res["jaccard_score_5-6"] == 1.0 and res["jaccard_score_10-12"] == 1.0

    # adversarial encoder: rank exactly the non-associated images ->
    # Jaccard 0 (disjoint sets when n_assoc <= size/2)
    def encode_text_wrong(texts):
        return -encode_text(texts)

    res0 = winogavil_task(encode_image, encode_text_wrong, instances=instances)
    assert res0["avg_jaccard_score"] == 0.0

    agg = aggregate({"winogavil": res})
    assert agg["winogavil_jaccard"] == 1.0

    # tar-shard loader round trip (instance = json + <key>.<i>.jpg members)
    from PIL import Image

    shard = tmp_path / "wino-0000.tar"
    with tf_mod.open(shard, "w") as tf:
        for key, size in (("0000", 5), ("0001", 6)):
            for i in range(size):
                img = Image.fromarray(
                    rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tf_mod.TarInfo(f"{key}.{i}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            meta = json.dumps(
                {"cue": "tree", "associations": [j < 2 for j in range(size)]}
            ).encode()
            info = tf_mod.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    loaded = list(iter_wds_wino(str(shard), image_size=32))
    assert [len(imgs) for imgs, _, _ in loaded] == [5, 6]
    assert all(cue == "tree" and mask.sum() == 2 for _, cue, mask in loaded)

    res_t = winogavil_task(
        lambda px: px.reshape(px.shape[0], -1)[:, :8],
        lambda ts: np.ones((len(ts), 8), np.float32),
        shards=str(shard),
        image_size=32,
    )
    assert 0.0 <= res_t["avg_jaccard_score"] <= 1.0
    assert set(res_t) >= {"jaccard_score_5", "jaccard_score_6", "jaccard_score_5-6"}


def test_datacomp_tasklist_and_aggregation():
    """Bundled 40-task DataComp metadata + the reference's aggregate
    accounting: ImageNet headline, three fixed groups, 38-task average
    (FairFace/UTKFace report-only)."""
    from contrastors_tpu.eval.datacomp import (
        DATACOMP_EXCLUDED_FROM_AVERAGE,
        DATACOMP_GROUPS,
        datacomp_aggregate_scores,
        load_datacomp_tasklist,
    )

    tl = load_datacomp_tasklist()
    assert len(tl) == 40
    names = {v["name"] for v in tl.values()}
    assert {"ImageNet 1k", "Flickr", "WinoGAViL", "FairFace"} <= names
    for members in DATACOMP_GROUPS.values():
        assert members <= names
    assert all(
        {"name", "main_metric", "size"} <= set(v) for v in tl.values()
    )
    assert tl["vtab/caltech101"]["main_metric"] == "mean_per_class_recall"
    assert tl["imagenet1k"]["num_classes"] == 1000

    # full synthetic run: every task scores 0.5 except ImageNet 1.0
    scores = {v["name"]: 0.5 for v in tl.values()}
    scores["ImageNet 1k"] = 1.0
    agg = datacomp_aggregate_scores(scores)
    assert agg["ImageNet"] == 1.0
    assert agg["VTAB"] == pytest.approx(0.5)
    assert agg["Retrieval"] == pytest.approx(0.5)
    assert agg["n_tasks"] == 38 == agg["n_tasks_expected"]
    assert agg["Average"] == pytest.approx((37 * 0.5 + 1.0) / 38)

    # partial run reports coverage instead of asserting
    partial = datacomp_aggregate_scores({"CIFAR-10": 0.7, "FairFace": 0.9})
    assert partial["n_tasks"] == 1 and partial["Average"] == pytest.approx(0.7)

    with pytest.raises(ValueError, match="unknown"):
        datacomp_aggregate_scores({"NotATask": 0.1})


# -- grad-cache large-batch path (reference reaches batch 16,384 via
# DeepSpeed ZeRO-2 + CPU offload, configs/deepspeed/image_text.json:17-28;
# here the chunked-remat grad cache, sharded over the data axis) -----------


def _lit_config(tmp_path, out_name, model_type="locked_text", **train_overrides):
    text_ckpt = make_checkpoint_dir(tmp_path)
    vis_ckpt = make_vision_checkpoint(tmp_path)
    shards = make_tar_shards(tmp_path, n_shards=1, per_shard=16)
    train_args = dict(
        num_epochs=1, num_train_steps=1, learning_rate=1e-3, weight_decay=0.0,
        warmup_steps=0, schedule_type="cosine", max_grad_norm=1.0,
        adam_beta1=0.9, adam_beta2=0.95, log_lr_every=1, log_grads_every=100,
        wandb=False, output_dir=str(tmp_path / out_name),
    )
    train_args.update(train_overrides)
    return Config(
        train_args=train_args,
        data_args=dict(
            image_text_shards=shards, batch_size=16, eval_batch_size=8, seed=0,
            workers=0, shuffle=True, train_num_samples=16,
        ),
        model_args=dict(model_type=model_type),
        text_model_args=dict(
            model_type=model_type, model_name=text_ckpt, pooling="mean",
            freeze=(model_type == "locked_text"), pretrained=True, seq_len=12,
            attn_impl="sdpa",
        ),
        vision_model_args=dict(
            model_type=model_type, model_name=vis_ckpt, pooling="map",
            pretrained=True, logit_scale=None, trainable_logit_scale=True,
            attn_impl="sdpa",
        ),
        transforms=dict(image_size=32),
    )


@pytest.mark.parametrize("model_type", ["locked_text", "clip"])
def test_image_text_grad_cache_matches_plain(tmp_path, model_type):
    """GradCache image-text step (shard_map over 8 devices, chunked towers)
    computes the same loss as the plain full-batch step; for the unlocked
    CLIP case (both towers replayed) the gradients match too."""
    import jax
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate

    cfg_plain = _lit_config(tmp_path, f"plain_{model_type}", model_type)
    cfg_gc = _lit_config(
        tmp_path / "gc", f"gc_{model_type}", model_type,
        grad_cache=True, chunk_size=2,
    )
    tr_plain = TRAINER_REGISTRY[model_type](cfg_plain, "fp32")
    tr_gc = TRAINER_REGISTRY[model_type](cfg_gc, "fp32")

    # identical checkpoints + seeds -> identical initial params
    a = np.asarray(tr_plain.params["params"]["text"]["trunk"]["emb_ln"]["weight"])
    b = np.asarray(tr_gc.params["params"]["text"]["trunk"]["emb_ln"]["weight"])
    np.testing.assert_array_equal(a, b)

    arrays = next(iter(tr_plain.dataloader))
    arrays = {k: v for k, v in arrays.items() if isinstance(v, np.ndarray)}
    rng = jax.random.PRNGKey(3)

    results = {}
    for name, tr in (("plain", tr_plain), ("gc", tr_gc)):
        step = tr.make_train_step()
        with tr.mesh:
            p = replicate(jax.device_get(tr.params), tr.mesh)
            o = replicate(jax.device_get(tr.opt_state), tr.mesh)
            batch = shard_batch(arrays, tr.mesh)
            _, _, metrics = step(p, o, batch, rng)
            results[name] = {k: float(v) for k, v in metrics.items()}

    np.testing.assert_allclose(
        results["gc"]["loss"], results["plain"]["loss"], rtol=1e-5, atol=1e-6
    )
    if model_type == "clip":
        # all params trainable -> the chunked grads must be exact
        np.testing.assert_allclose(
            results["gc"]["grad_norm"], results["plain"]["grad_norm"], rtol=1e-4
        )


def test_image_text_grad_cache_uint8_pixels(tmp_path):
    """uint8 pixel batches (4x smaller host->device transfer) normalize on
    device inside the chunk encoder and match the float pipeline exactly."""
    import jax
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate
    from contrastors_tpu.config import OPENAI_IMAGE_MEAN, OPENAI_IMAGE_STD

    cfg = _lit_config(tmp_path, "u8", grad_cache=True, chunk_size=2)
    tr = TRAINER_REGISTRY["locked_text"](cfg, "fp32")
    arrays = next(iter(tr.dataloader))
    arrays = {k: v for k, v in arrays.items() if isinstance(v, np.ndarray)}

    u8 = np.random.default_rng(0).integers(0, 256, size=arrays["pixel_values"].shape).astype(np.uint8)
    mean = np.asarray(OPENAI_IMAGE_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(OPENAI_IMAGE_STD, np.float32).reshape(1, 3, 1, 1)
    as_float = (u8.astype(np.float32) / 255.0 - mean) / std

    step = tr.make_train_step()
    rng = jax.random.PRNGKey(5)
    losses = {}
    for name, px in (("u8", u8), ("f32", as_float.astype(np.float32))):
        with tr.mesh:
            p = replicate(jax.device_get(tr.params), tr.mesh)
            o = replicate(jax.device_get(tr.opt_state), tr.mesh)
            batch = shard_batch(dict(arrays, pixel_values=px), tr.mesh)
            _, _, metrics = step(p, o, batch, rng)
            losses[name] = float(metrics["loss"])
    np.testing.assert_allclose(losses["u8"], losses["f32"], rtol=1e-6)


def test_image_text_grad_cache_direct_chunks_exact(tmp_path):
    """Hybrid direct chunks in the image-text grad-cache step (leading
    chunks keep live vjp activations, skip pass-2) are exact: loss and
    grad norm match the all-pass-2 step bit-for-bit in structure."""
    import jax
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate

    cfg0 = _lit_config(
        tmp_path, "gc_d0", "clip", grad_cache=True, chunk_size=1,
    )
    cfg1 = _lit_config(
        tmp_path / "d1", "gc_d1", "clip", grad_cache=True, chunk_size=1,
        grad_cache_direct_chunks_q=1, grad_cache_direct_chunks_d=1,
    )
    arrays = None
    rng = jax.random.PRNGKey(7)
    results = {}
    for name, cfg in (("d0", cfg0), ("d1", cfg1)):
        tr = TRAINER_REGISTRY["clip"](cfg, "fp32")
        if arrays is None:
            arrays = next(iter(tr.dataloader))
            arrays = {k: v for k, v in arrays.items() if isinstance(v, np.ndarray)}
        step = tr.make_train_step()
        with tr.mesh:
            p = replicate(jax.device_get(tr.params), tr.mesh)
            o = replicate(jax.device_get(tr.opt_state), tr.mesh)
            batch = shard_batch(arrays, tr.mesh)
            _, _, metrics = step(p, o, batch, rng)
            results[name] = {k: float(v) for k, v in metrics.items()}
    np.testing.assert_allclose(results["d1"]["loss"], results["d0"]["loss"], rtol=1e-6)
    np.testing.assert_allclose(
        results["d1"]["grad_norm"], results["d0"]["grad_norm"], rtol=1e-4
    )


def test_overlay_tower_strict(tmp_path):
    """A checkpoint key with no destination (or the wrong shape) must raise
    instead of silently leaving random init in place."""
    from contrastors_tpu.trainers.image_text import _overlay_tower

    params = {"params": {"text": {"trunk": {"w": np.zeros((2, 2), np.float32)}}}}
    good = {"params": {"trunk": {"w": np.ones((2, 2), np.float32)}}}
    out = _overlay_tower(params, "text", good)
    np.testing.assert_array_equal(np.asarray(out["params"]["text"]["trunk"]["w"]), 1.0)

    with pytest.raises(ValueError, match="dropped"):
        _overlay_tower(params, "text", {"params": {"trunk": {"w_renamed": np.ones((2, 2))}}})
    with pytest.raises(ValueError, match="shape mismatch"):
        _overlay_tower(params, "text", {"params": {"trunk": {"w": np.ones((3, 2))}}})
    with pytest.raises(ValueError, match="dropped"):
        _overlay_tower(params, "text", {"params": {"extra_block": {"w": np.ones((2, 2))}}})
    # a checkpoint leaf colliding with a model SUBTREE must raise the
    # path-named ValueError, not AttributeError on dict.shape
    with pytest.raises(ValueError, match="type mismatch"):
        _overlay_tower(params, "text", {"params": {"trunk": np.ones((2, 2))}})


def test_iter_tar_samples_precomputed_npy(tmp_path):
    """Shards carrying .npy text embeddings instead of captions must yield
    (round-3 review #2: the caption guard made precomputed-text shards
    yield nothing and the loader spin forever)."""
    import io as _io
    import tarfile as _tarfile

    from contrastors_tpu.data.image_text import iter_tar_samples

    rng = np.random.default_rng(0)
    path = tmp_path / "pre.tar"
    with _tarfile.open(path, "w") as tf:
        for i in range(3):
            img = rand_image(rng)
            buf = _io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = _tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
            emb = np.random.default_rng(i).standard_normal(8).astype(np.float32)
            nbuf = _io.BytesIO()
            np.save(nbuf, emb)
            ndata = nbuf.getvalue()
            info = _tarfile.TarInfo(f"{i:06d}.npy")
            info.size = len(ndata)
            tf.addfile(info, _io.BytesIO(ndata))
    samples = list(iter_tar_samples(str(path)))
    assert len(samples) == 3
    assert all("text_embedding" in s and "image" in s for s in samples)


def test_shard_split_fewer_shards_than_ranks_raises(tmp_path):
    """Silently duplicating a shard across ranks puts identical samples in
    the global batch (duplicate positives labeled negatives) — raise and
    point at dataset_resampled instead (round-3 review #9)."""
    from contrastors_tpu.data.image_text import ImageTextDataset
    from test_data import make_tokenizer

    pattern = make_tar_shards(tmp_path, n_shards=2, per_shard=4)
    ds = ImageTextDataset(
        pattern, global_batch_size=8, tokenizer=make_tokenizer(tmp_path),
        image_size=32, process_index=3, process_count=4,
    )
    with pytest.raises(ValueError, match="resampled"):
        ds._shard_order()


def test_bundled_zeroshot_classnames():
    """Bundled class lists resolve task specs without user YAML (round-2
    VERDICT missing #5; reference gets these from clip_benchmark)."""
    from contrastors_tpu.eval.datacomp import (
        bundled_classnames,
        load_datacomp_tasklist,
        resolve_classnames,
    )

    bundle = bundled_classnames()
    tl = load_datacomp_tasklist()
    # every tasklist-keyed bundle entry has the right cardinality (bare
    # aliases like "pets" for "vtab/pets" are allowed alongside)
    keyed = {k: v for k, v in bundle.items() if k in tl}
    assert {"cifar10", "vtab/pets", "food101", "mnist", "stl10"} <= set(keyed)
    for key, classes in keyed.items():
        assert len(classes) == tl[key]["num_classes"], key

    # resolution precedence: explicit > bundled > error
    assert resolve_classnames({"name": "x", "classnames": ["a", "b"]}) == ["a", "b"]
    assert len(resolve_classnames({"key": "vtab/pets", "name": "Oxford-IIIT Pet"})) == 37
    assert resolve_classnames({"name": "CIFAR-10", "key": "cifar10"})[0] == "airplane"
    assert len(resolve_classnames({"name": "ImageNet 1k", "key": "imagenet1k"})) == 1000
    with pytest.raises(ValueError, match="no classnames"):
        resolve_classnames({"name": "Stanford Cars", "key": "cars"})


def test_loader_ships_uint8_under_grad_cache(tmp_path):
    """With grad_cache on, the train loader ships raw uint8 CHW pixels
    (4x smaller host->device transfer; normalization runs on device per
    chunk) and the step's loss matches the float-normalized pipeline;
    without grad_cache the loader keeps the float32 contract."""
    import jax
    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.parallel.mesh import replicate
    from contrastors_tpu.config import OPENAI_IMAGE_MEAN, OPENAI_IMAGE_STD

    cfg = _lit_config(tmp_path, "u8loader", grad_cache=True, chunk_size=2)
    tr = TRAINER_REGISTRY["locked_text"](cfg, "fp32")
    arrays = next(iter(tr.dataloader))
    arrays = {k: v for k, v in arrays.items() if isinstance(v, np.ndarray)}
    assert arrays["pixel_values"].dtype == np.uint8

    mean = np.asarray(OPENAI_IMAGE_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(OPENAI_IMAGE_STD, np.float32).reshape(1, 3, 1, 1)
    as_float = (arrays["pixel_values"].astype(np.float32) / 255.0 - mean) / std

    step = tr.make_train_step()
    rng = jax.random.PRNGKey(9)
    losses = {}
    for name, px in (("u8", arrays["pixel_values"]), ("f32", as_float.astype(np.float32))):
        with tr.mesh:
            p = replicate(jax.device_get(tr.params), tr.mesh)
            o = replicate(jax.device_get(tr.opt_state), tr.mesh)
            batch = shard_batch(dict(arrays, pixel_values=px), tr.mesh)
            _, _, metrics = step(p, o, batch, rng)
            losses[name] = float(metrics["loss"])
    np.testing.assert_allclose(losses["u8"], losses["f32"], rtol=1e-6)

    cfg_plain = _lit_config(tmp_path / "pl", "f32loader")
    tr_plain = TRAINER_REGISTRY["locked_text"](cfg_plain, "fp32")
    plain = next(iter(tr_plain.dataloader))
    assert plain["pixel_values"].dtype == np.float32
