"""Engine: windowed eval over a synthetic dataset end-to-end; checkpoint
save/restore roundtrip."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from openvis_tpu.checkpoint import (
    merge_pretrained,
    restore_checkpoint,
    save_checkpoint,
)
from openvis_tpu.config import Config
from openvis_tpu.data import catalog, rle
from openvis_tpu.engine import evaluate_dataset
from openvis_tpu.parallel.train_step import TrainState, make_optimizer
from openvis_tpu.train import init_model

K, D = 2, 32


def _cfg(root):
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, conv_dim=64, mask_dim=64,
            transformer_enc_layers=1, dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, hidden_dim=64, num_queries=8,
            nheads=4, dim_feedforward=128, dec_layers=2, mask_dim=64,
            clip_embed_dim=D,
        ),
        test=dataclasses.replace(cfg.model.test, window_size=4),
    )
    inp = dataclasses.replace(
        cfg.input, min_size_test=48, max_size_test=96, pad_size=(64, 96),
        max_instances=6,
    )
    ds = dataclasses.replace(
        cfg.datasets, root=root, test=("synth_eval",)
    )
    return dataclasses.replace(cfg, model=m, input=inp, datasets=ds)


@pytest.fixture()
def synth_root(tmp_path):
    root = str(tmp_path)
    h, w, t = 48, 64, 10  # 10 frames -> 3 windows of 4 (padded tail)
    img_dir = tmp_path / "vids" / "JPEGImages" / "v1"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    fns = []
    for f in range(t):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"{f:05d}.jpg"
        )
        fns.append(f"v1/{f:05d}.jpg")
    segs = []
    for f in range(t):
        m = np.zeros((h, w), np.uint8)
        m[10:25, 10 + f : 30 + f] = 1
        segs.append(rle.encode(m))
    js = {
        "videos": [{"id": 1, "height": h, "width": w, "length": t,
                    "file_names": fns}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": segs,
                         "bboxes": [[10, 10, 20, 15]] * t, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "c1"}, {"id": 2, "name": "c2"}],
    }
    with open(tmp_path / "eval.json", "w") as f:
        json.dump(js, f)
    info = catalog.DatasetInfo(
        name="synth_eval", image_root="vids/JPEGImages",
        json_file="eval.json", thing_classes=("c1", "c2"),
        id_map={1: 0, 2: 1},
    )
    catalog.register(info)
    return root


def test_windowed_eval_runs(synth_root):
    cfg = _cfg(synth_root)
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    metrics = evaluate_dataset(cfg, model, params, "synth_eval", text)
    # random weights -> no meaningful AP, but the whole pipe must produce
    # the full metric suite with finite values
    assert set(metrics) >= {"AP", "AP50", "AR10"}
    for v in metrics.values():
        assert np.isfinite(v)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(str(tmp_path))
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, 7, jax.device_get(state))
    restored = restore_checkpoint(ckpt, jax.device_get(state))
    assert restored is not None and int(restored.step) == 7
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_pretrained_partial():
    params = {"segmenter": {"a": np.zeros(3), "b": np.ones(2)}, "other": {"c": np.ones(1)}}
    pre = {"a": np.full(3, 5.0)}
    out = merge_pretrained(params, pre, subtree="segmenter")
    np.testing.assert_array_equal(out["segmenter"]["a"], np.full(3, 5.0))
    np.testing.assert_array_equal(out["segmenter"]["b"], np.ones(2))
    np.testing.assert_array_equal(out["other"]["c"], np.ones(1))


def test_brivis_single_shot_eval(synth_root):
    import dataclasses

    from tests.test_brivis import brivis_tiny_config

    cfg = brivis_tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            num_classes=K,
            test=dataclasses.replace(cfg.model.test, max_frames=16),
        ),
        input=dataclasses.replace(
            cfg.input, min_size_test=48, max_size_test=96, pad_size=(64, 96),
            max_instances=6,
        ),
        datasets=dataclasses.replace(
            cfg.datasets, root=synth_root, test=("synth_eval",)
        ),
    )
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 3, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    metrics = evaluate_dataset(cfg, model, params, "synth_eval", text)
    assert "AP" in metrics


def test_ov2seg_windowed_eval(synth_root):
    cfg = _cfg(synth_root)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, meta_architecture="OV2Seg",
            transformer_decoder=dataclasses.replace(
                cfg.model.transformer_decoder, name="ov2seg_frame",
            ),
        ),
    )
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    metrics = evaluate_dataset(cfg, model, params, "synth_eval", text)
    assert "AP" in metrics


def test_clip_ensemble_combination():
    from openvis_tpu.engine import apply_clip_ensemble

    scores = jnp.asarray([[0.8, 0.2], [0.5, 0.5]])
    clip_logits = jnp.zeros((2, 2, 3))  # uniform clip probs
    valid = jnp.asarray([[True, False], [True, False]])
    out = np.asarray(apply_clip_ensemble(scores, clip_logits, valid, 0.5))
    # valid query 0: geometric mean with 0.5 -> sqrt(s * 0.5)
    np.testing.assert_allclose(out[0, 0], np.sqrt(0.8 * 0.5), rtol=1e-5)
    # invalid query 1: clip side maps back to ones -> sqrt(s * 1)
    np.testing.assert_allclose(out[1, 0], np.sqrt(0.5), rtol=1e-5)
