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
    return dataclasses.replace(
        cfg, model=m, input=inp, datasets=ds,
        output_dir=os.path.join(root, "out"),
    )


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


def test_brivis_windowed_eval_no_truncation(synth_root):
    """BriVIS long-video path: per-frame stack in windows + full-sequence
    resampler.  max_frames(4) << video length(10); every frame must still
    contribute (the round-1 single-shot path truncated at max_frames)."""
    import dataclasses

    from tests.test_brivis import brivis_tiny_config

    cfg = brivis_tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            num_classes=K,
            test=dataclasses.replace(
                cfg.model.test, max_frames=4, window_size=4
            ),
        ),
        input=dataclasses.replace(
            cfg.input, min_size_test=48, max_size_test=96, pad_size=(64, 96),
            max_instances=6,
        ),
        datasets=dataclasses.replace(
            cfg.datasets, root=synth_root, test=("synth_eval",)
        ),
        output_dir=os.path.join(synth_root, "out_brivis"),
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
    preds = json.load(open(
        os.path.join(cfg.output_dir, "results_synth_eval.json")
    ))
    assert preds, "windowed BriVIS eval produced no predictions"
    for p in preds:
        assert len(p["segmentations"]) == 10  # all frames, not max_frames


def _offline_overrides(cfg, root, out_name):
    """Tiny eval overrides: video length 10 >> max_frames 4 so the windowed
    offline path must engage."""
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, num_classes=K,
            test=dataclasses.replace(
                cfg.model.test, max_frames=4, window_size=4
            ),
        ),
        input=dataclasses.replace(
            cfg.input, min_size_test=48, max_size_test=96, pad_size=(64, 96),
            max_instances=6,
        ),
        datasets=dataclasses.replace(
            cfg.datasets, root=root, test=("synth_eval",)
        ),
        output_dir=os.path.join(root, out_name),
    )


@pytest.mark.parametrize(
    "arch", ["SimpleBaseline", "VideoMaskFormer", "MasQCLIP", "SAN",
             "BriVIS_decoupled", "BriVIS_raw"]
)
def test_offline_long_video_no_truncation(synth_root, arch):
    """Offline (single-shot) archs on videos longer than ``test.max_frames``
    must evaluate EVERY frame via the windowed decomposition (reference
    ``run_window_inference``, san.py:285-307 / simplebsl.py:237-238) — the
    round-2 path silently truncated at max_frames."""
    if arch in ("BriVIS_decoupled", "BriVIS_raw"):
        from tests.test_brivis import brivis_tiny_config

        cfg = brivis_tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                resampler=dataclasses.replace(
                    cfg.model.resampler, name=arch.split("_")[1]
                ),
            ),
        )
    elif arch == "SAN":
        from tests.test_san import san_tiny_config

        cfg = san_tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                meta_architecture="SAN",
                transformer_decoder=dataclasses.replace(
                    cfg.model.transformer_decoder, name="side_adapter_video"
                ),
            ),
        )
    else:
        decoder = {
            "SimpleBaseline": "video_embedding",
            "VideoMaskFormer": "video",
            "MasQCLIP": "video_proposal",
        }[arch]
        cfg = _cfg(synth_root)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                meta_architecture=arch,
                transformer_decoder=dataclasses.replace(
                    cfg.model.transformer_decoder, name=decoder
                ),
                clip_adapter=dataclasses.replace(
                    cfg.model.clip_adapter, clip_model_name="test-tiny"
                ),
            ),
        )
    cfg = _offline_overrides(cfg, synth_root, f"out_offline_{arch}")

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
    preds = json.load(open(
        os.path.join(cfg.output_dir, "results_synth_eval.json")
    ))
    assert preds, f"{arch}: windowed offline eval produced no predictions"
    for p in preds:
        assert len(p["segmentations"]) == 10  # all frames, not max_frames


def test_multihost_eval_partition_and_gather(synth_root, monkeypatch):
    """Simulated 2-process eval: each rank sees a disjoint video stride
    (_host_videos) and _finalize gathers rank partials before scoring
    (reference ytvis_eval.py:117-135 comm.gather + rank-0 scoring)."""
    import openvis_tpu.engine as eng

    # --- striding ---
    fake_videos = [({"video_id": i}, {"i": i}) for i in range(5)]
    monkeypatch.setattr(eng, "test_videos", lambda cfg, ds: iter(fake_videos))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    got = [r["video_id"] for r, _ in eng._host_videos(None, "ds", 4)]
    assert got == [1, 3]  # rank 1 of 2, max_videos=4 counted globally
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    got = [r["video_id"] for r, _ in eng._host_videos(None, "ds", None)]
    assert got == [0, 2, 4]

    # --- gather: rank 1 writes + returns {}, rank 0 merges all partials ---
    from jax.experimental import multihost_utils

    monkeypatch.setattr(
        multihost_utils, "sync_global_devices", lambda name: None
    )
    cfg = _cfg(synth_root)
    info = catalog.get("synth_eval")
    from openvis_tpu.evals.ytvis_eval import YTVISEvaluator

    def pred(vid, score):
        return {"video_id": vid, "category_id": 1, "score": score,
                "segmentations": [None]}

    ev1 = YTVISEvaluator(info)
    ev1.predictions = [pred(2, 0.5)]
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert eng._finalize(cfg, "synth_eval", ev1) == {}

    ev0 = YTVISEvaluator(info)
    ev0.predictions = [pred(1, 0.9)]
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    metrics = eng._finalize(cfg, "synth_eval", ev0)
    merged = json.load(open(
        os.path.join(cfg.output_dir, "results_synth_eval.json")
    ))
    assert {p["video_id"] for p in merged} == {1, 2}
    assert metrics  # rank 0 scores the merged set


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


@pytest.fixture()
def synth_burst_root(tmp_path):
    """Synthetic BURST-format (TAO) dataset: one sequence, two LVIS-id
    tracks (mirrors /root/reference/openvis/data/datasets/burst.py:538-583
    sequence schema)."""
    root = str(tmp_path)
    h, w, t = 48, 64, 6
    img_dir = tmp_path / "frames" / "val" / "YFCC100M" / "seq_a"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    paths = []
    for f in range(t):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"frame{f:04d}.jpg"
        )
        paths.append(f"frame{f:04d}.jpg")
    segmentations = []
    for f in range(t):
        m1 = np.zeros((h, w), np.uint8)
        m1[10:25, 10 + f : 30 + f] = 1
        m2 = np.zeros((h, w), np.uint8)
        m2[30:44, 2:20] = 1
        segmentations.append({
            "1": {"rle": rle.encode(m1)["counts"]},
            "2": {"rle": rle.encode(m2)["counts"]},
        })
    js = {"sequences": [{
        "id": 1, "width": w, "height": h, "seq_name": "seq_a",
        "dataset": "YFCC100M", "annotated_image_paths": paths,
        "segmentations": segmentations,
        "track_category_ids": {"1": 5, "2": 7},  # fake LVIS ids
    }]}
    with open(tmp_path / "burst_val.json", "w") as f:
        json.dump(js, f)
    catalog.register(catalog.DatasetInfo(
        name="synth_burst", image_root="frames/val",
        json_file="burst_val.json", thing_classes=("c1", "c2"),
        id_map={5: 0, 7: 1}, kind="burst", eval_type="burst",
    ))
    return root


def test_burst_eval_end_to_end(synth_burst_root):
    """--eval-only on a burst dataset must produce HOTA + TrackMAP metrics
    (reference Trainer.build_evaluator dispatch, train_net.py:78-88)."""
    cfg = _cfg(synth_burst_root)
    cfg = dataclasses.replace(
        cfg, datasets=dataclasses.replace(
            cfg.datasets, root=synth_burst_root, test=("synth_burst",)
        ),
        output_dir=os.path.join(synth_burst_root, "out"),
    )
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    metrics = evaluate_dataset(cfg, model, params, "synth_burst", text)
    assert {"HOTA", "DetA", "AssA", "mAP"} <= set(metrics)
    for v in metrics.values():
        assert np.isfinite(v)
    # predictions dumped for offline scoring
    res = os.path.join(synth_burst_root, "out", "results_synth_burst.json")
    assert os.path.exists(res)
    preds = json.load(open(res))
    assert all(p["category_id"] in (5, 7) for p in preds)


def _tiny_clip_msgpack(root):
    """Converted-CLIP-style msgpack with a REAL test-tiny visual tree (the
    layout build_clip_visual loads)."""
    from openvis_tpu.models.clip.model import (
        CLIPVisionTransformer,
        _MODEL_SHAPES,
    )
    from tools.convert_weights import save_msgpack

    s = _MODEL_SHAPES["test-tiny"]
    vis = CLIPVisionTransformer(
        patch_size=s["vision_patch"], width=s["vision_width"],
        layers=s["vision_layers"], heads=s["vision_heads"],
        embed_dim=s["embed_dim"], image_size=s["image_size"],
    )
    params = vis.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, s["image_size"], s["image_size"], 3)),
    )["params"]
    path = os.path.join(root, "clip_tiny.msgpack")
    save_msgpack({"visual": jax.tree.map(np.asarray, params)}, path)
    return path


def test_openvis_adapted_clip_eval_changes_scores(synth_root):
    """VERDICT r3 #1: clip_adapter.name routes the REAL eval path — the
    mask-prompted tower (name="adapted") must produce different OpenVIS
    scores than the plain tower from the SAME converted weights (the
    adapted tower re-masks evolved patch tokens with the zero-init
    mask_embedding at depth>1, mask_adapted_adapter.py:35-151 +
    model.py:330-349), via the exact jitted score fn the engine uses,
    then end-to-end through evaluate_dataset."""
    from openvis_tpu.engine import build_clip_visual, make_openvis_score_fn

    wpath = _tiny_clip_msgpack(synth_root)
    base = _cfg(synth_root)
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    def cfg_for(name):
        return dataclasses.replace(
            base,
            model=dataclasses.replace(
                base.model, meta_architecture="OpenVISOnline",
                transformer_decoder=dataclasses.replace(
                    base.model.transformer_decoder, name="frame_proposal",
                ),
                clip_adapter=dataclasses.replace(
                    base.model.clip_adapter, name=name,
                    clip_model_name="test-tiny", weights=wpath,
                    mask_prompt_depth=2,
                ),
            ),
        )

    # the engine's score path on crafted masks: a confident box proposal
    # whose square crop runs out of frame (zero-filled mask band -> real
    # background patches for the prompt)
    frames = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255)
    mask_logits = np.full((2, 3, 16, 24), -8.0, np.float32)
    mask_logits[:, 0, 4:14, 2:22] = 8.0
    mask_logits[:, 1, 6:10, 10:14] = 8.0
    out = {}
    for name in ("clip", "adapted"):
        cfg = cfg_for(name)
        visual_apply, adapted = build_clip_visual(cfg)
        assert adapted == (name == "adapted")
        fn = jax.jit(make_openvis_score_fn(cfg, visual_apply))
        lg, vd = fn(frames, jnp.asarray(mask_logits), jnp.asarray(text))
        assert lg.shape == (2, 3, K) and bool(vd[0, 0]) and not bool(vd[0, 2])
        out[name] = np.asarray(lg)
    assert np.abs(out["clip"] - out["adapted"]).max() > 1e-5

    # end-to-end: the adapted tower drives a full OpenVIS evaluation
    cfg = cfg_for("adapted")
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    visual_apply, _ = build_clip_visual(cfg)
    metrics = evaluate_dataset(
        cfg, model, params, "synth_eval", text,
        clip_visual_apply=visual_apply,
    )
    assert np.isfinite(metrics["AP"])


def test_simplebsl_clip_ensemble_eval(synth_root):
    """SimpleBSL open_vocabulary_ensemble through the real eval path
    (simplebsl.py:118-163): with a frozen CLIP tower present, the
    geometric-mean combination must change the predictions vs the
    no-ensemble run (and the bg_clip text bank grows the learned
    no-object row)."""
    from openvis_tpu.engine import build_clip_visual

    wpath = _tiny_clip_msgpack(synth_root)
    base = _cfg(synth_root)
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model,
            clip_adapter=dataclasses.replace(
                base.model.clip_adapter, name="bg_clip",
                clip_model_name="test-tiny", weights=wpath,
                clip_ensemble=True, clip_ensemble_weight=0.8,
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

    def preds():
        return json.load(open(os.path.join(
            synth_root, "out", "results_synth_eval.json")))

    m_plain = evaluate_dataset(cfg, model, params, "synth_eval", text)
    p_plain = sorted(round(p["score"], 6) for p in preds())

    visual_apply, adapted = build_clip_visual(cfg)
    assert not adapted
    m_ens = evaluate_dataset(
        cfg, model, params, "synth_eval", text,
        clip_visual_apply=visual_apply,
    )
    p_ens = sorted(round(p["score"], 6) for p in preds())
    assert np.isfinite(m_ens["AP"])
    assert p_plain != p_ens

    # ensemble with the ADAPTED tower also routes (bg_adapted)
    cfg_ad = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            clip_adapter=dataclasses.replace(
                cfg.model.clip_adapter, name="bg_adapted",
                mask_prompt_depth=2,
            ),
        ),
    )
    visual_ad, adapted = build_clip_visual(cfg_ad)
    assert adapted
    m_ad = evaluate_dataset(
        cfg_ad, model, params, "synth_eval", text,
        clip_visual_apply=visual_ad,
    )
    assert np.isfinite(m_ad["AP"]) and preds()


def test_openvis_windowed_eval_clip_scoring(synth_root):
    """OpenVISOnline eval: class-agnostic proposals + chunked mask-crop CLIP
    classification (openvis.py:110-147) — the clip-score branch replaces the
    generic postprocess entirely."""
    cfg = _cfg(synth_root)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, meta_architecture="OpenVISOnline",
            transformer_decoder=dataclasses.replace(
                cfg.model.transformer_decoder, name="frame_proposal",
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

    def fake_clip_visual(imgs):  # (R, S, S, 3) -> (R, D)
        return imgs.mean(axis=(1, 2)) @ jnp.ones((3, D))

    metrics = evaluate_dataset(
        cfg, model, params, "synth_eval", text,
        clip_visual_apply=fake_clip_visual,
    )
    assert "AP" in metrics and np.isfinite(metrics["AP"])


def test_mesh_sharded_eval_matches_sequential(synth_root):
    """Eval-time mesh sharding (SURVEY §2.6): groups of windows run as one
    data-parallel batch over the CPU-8 mesh; metrics must be identical to
    the sequential path."""
    from jax.sharding import Mesh

    cfg = _cfg(synth_root)
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)
    seq = evaluate_dataset(cfg, model, params, "synth_eval", text)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    assert mesh.devices.size == 8  # conftest forces the CPU-8 platform
    par = evaluate_dataset(cfg, model, params, "synth_eval", text, mesh=mesh)
    for k in seq:
        np.testing.assert_allclose(par[k], seq[k], rtol=1e-4, atol=1e-6)


def test_amp_eval_bounded_drift(synth_root):
    """AMP eval (``test.amp``, mirroring the reference's autocast evaluation,
    train_net.py:241-242): bf16 scores must stay within a tight bound of the
    f32 path, and the predicted masks must be near-identical (the final
    logit upsample + threshold runs in f32 either way)."""
    from openvis_tpu.data import rle as rle_util

    cfg = _cfg(synth_root)
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    sample = {
        "pixels": jnp.zeros((1, 2, 64, 96, 3), jnp.float32),
        "text_feats": jnp.asarray(text),
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), sample)

    def run(amp, out_name):
        c = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, test=dataclasses.replace(cfg.model.test, amp=amp)
            ),
            output_dir=os.path.join(synth_root, out_name),
        )
        evaluate_dataset(c, model, params, "synth_eval", text)
        with open(os.path.join(c.output_dir,
                               "results_synth_eval.json")) as f:
            return json.load(f)

    p32 = run(False, "out_f32")
    p16 = run(True, "out_bf16")
    assert len(p32) == len(p16) > 0
    for a, b in zip(p32, p16):
        assert a["category_id"] == b["category_id"]
        assert abs(a["score"] - b["score"]) < 0.02
        for sa, sb in zip(a["segmentations"], b["segmentations"]):
            ma, mb = rle_util.decode(sa), rle_util.decode(sb)
            inter, union = (ma & mb).sum(), (ma | mb).sum()
            assert union == 0 or inter / union > 0.95


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


def test_verify_expected_results():
    """Reference verify_results over TEST.EXPECTED_RESULTS (train_net.py:295):
    in-tolerance passes, out-of-tolerance / missing metric fails, other
    datasets' rows are skipped."""
    from openvis_tpu.engine import verify_expected_results

    metrics = {"AP": 0.351, "AP50": 0.60}
    exp_ok = (["ds1", "AP", 0.35, 0.01], ["other", "AP", 0.9, 0.0])
    assert verify_expected_results(exp_ok, "ds1", metrics)
    assert not verify_expected_results(
        (["ds1", "AP", 0.50, 0.01],), "ds1", metrics)
    assert not verify_expected_results(
        (["ds1", "nope", 0.50, 0.01],), "ds1", metrics)
    # config round-trip: YAML list-of-lists lands as a tuple of rows
    cfg = Config()
    test_cfg = dataclasses.replace(
        cfg.model.test, expected_results=([["ds1", "AP", 0.35, 0.01]]))
    assert verify_expected_results(
        tuple(test_cfg.expected_results), "ds1", metrics)
