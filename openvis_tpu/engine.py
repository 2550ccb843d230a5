"""Evaluation engine: windowed video inference + evaluator loop.

Rebuild of the reference's eval path (``train_net.py:205-253`` Trainer.test
+ per-model ``run_window_inference``, ``minvis.py:340-362`` /
``san.py:285-307`` / ``ov2seg.py:961-985`` / ``openvis.py:244-281``): long
videos are chunked into fixed-size windows, the per-frame stack runs per
window, and the small per-frame artifacts (query embeddings, logits) plus
1/4-res mask logits are concatenated over windows; cross-window identity is
restored by embedding tracking over the full concatenated sequence
(``minvis.py:320-338``).

Per-arch score paths:
  * SimpleBSL / SAN / MinVIS: softmax(frame-mean logits) minus bg;
  * OV2Seg: sqrt(sigmoid(cls) * p_obj) with EMA tracking and per-frame
    score gating;
  * OpenVIS: class-agnostic masks scored by chunked mask-crop CLIP
    classification after tracking (boxes computed on the 1/4 grid, scaled
    x4 for the frame crop — no full-res mask upsample).

TPU deltas: windows are a fixed static shape (tail padded by repeating the
last valid frame), so a whole video evaluates with a handful of traces;
masks stay on device at 1/4 resolution until the final host-side RLE encode.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
# tower-building + mask-crop score paths live in clip_towers (split out of
# this module); re-exported names keep the engine.* API stable
from openvis_tpu.clip_towers import (  # noqa: F401
    amp_cast,
    apply_clip_ensemble,
    build_clip_visual,
    clip_crop_scores as _clip_crop_scores,
    crop_text_with_bg,
    eval_dtype,
    make_openvis_score_fn,
    raw_frames as _raw_frames,
)
from openvis_tpu.data import catalog
from openvis_tpu.data.loader import test_videos
from openvis_tpu.evals.burst_eval import BURSTEvaluator
from openvis_tpu.evals.ytvis_eval import YTVISEvaluator
from openvis_tpu.models.postprocess import inference_video_topk
from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds
from openvis_tpu.utils.image import resize_bilinear_torch_hw

logger = logging.getLogger(__name__)


def verify_expected_results(expected, dataset_name: str, metrics: Dict) -> bool:
    """Check eval metrics against config expectations — the reference's
    ``verify_results(cfg, res)`` over ``TEST.EXPECTED_RESULTS``
    (train_net.py:294-295).  ``expected`` is the config's
    ``model.test.expected_results``: [dataset, metric, value, tolerance]
    rows; rows for other datasets are skipped.  Logs each comparison and
    returns False if any row for this dataset is missing or out of
    tolerance."""
    ok = True
    for row in expected:
        ds, metric, want, tol = row
        if ds != dataset_name:
            continue
        if metric not in metrics:
            logger.error("expected_results: %s has no metric %r (have %s)",
                         dataset_name, metric, sorted(metrics))
            ok = False
            continue
        got = float(metrics[metric])
        good = abs(got - float(want)) <= float(tol)
        (logger.info if good else logger.error)(
            "expected_results: %s %s = %.4f, expected %.4f ± %.4f -> %s",
            dataset_name, metric, got, float(want), float(tol),
            "OK" if good else "FAIL",
        )
        ok = ok and good
    return ok


def make_evaluator(info):
    """Dispatch on the dataset's eval protocol (Trainer.build_evaluator,
    reference train_net.py:78-88): BURST datasets get HOTA+TrackMAP, the
    rest the YTVIS COCO-protocol suite."""
    if info.eval_type == "burst":
        return BURSTEvaluator(
            class_splits=catalog.burst_class_splits(), dataset_info=info
        )
    return YTVISEvaluator(info)


def _emit(evaluator, video_id, topk_np, image_size, orig_size):
    if isinstance(evaluator, BURSTEvaluator):
        evaluator.process_video(video_id, topk_np, image_size, orig_size)
    else:
        evaluator.process(video_id, topk_np, image_size, orig_size)


def window_size(cfg: Config) -> int:
    """Effective inference window.  ``test.window_inference: false`` (the
    reference's ``MODEL.MASK_FORMER.TEST.WINDOW_INFERENCE`` default,
    ``openvis/config.py:117``; the shipped recipes set it true) evaluates
    each video as ONE window — statically, a window of ``test.max_frames``
    (videos longer than that would window regardless, our long-video
    contract: no frame is dropped)."""
    t = cfg.model.test
    return t.window_size if t.window_inference else t.max_frames


def make_window_fn(cfg: Config, model):
    """f(params, frames (G*W,H,Wd,3), text) -> per-window raw outputs with a
    leading window-batch axis G.  G > 1 is the eval-time mesh-sharding path
    (SURVEY §2.6): the per-frame stack is embarrassingly parallel over
    windows, so a group of G windows runs as one data-parallel batch."""
    arch = cfg.model.meta_architecture
    window = window_size(cfg)

    def fn(params, frames, text_feats):
        out = model.apply({"params": params}, frames, window, text_feats)
        res = {
            "logits": out.get("pred_logits"),   # (G, W, Q, C)
            "masks": out["pred_masks"],         # (G, Q, W, h, w)
            "embeds": out.get("pred_embeds"),   # (G, W, Q, C)
        }
        if arch.startswith("OV2Seg"):
            res["obj_logits"] = out["pred_object_logits"]
        return res

    return fn


def make_postprocess_fn(cfg: Config):
    """f(logits (T,Q,C), masks (Q,T,h,w), embeds (T,Q,C), frame_valid (T,),
    extras) -> topk dict over the padded time bucket."""
    arch = cfg.model.meta_architecture
    topk = cfg.model.test.topk_per_video
    ema = 0.7 if arch.startswith("OV2Seg") else 1.0

    def fn(logits, masks, embeds, frame_valid, obj_logits=None):
        # masks stay RAW (per-frame query order); tracking alignment is
        # fused into the topk mask gather via track_indices — only the
        # selected topk masks ever move, not all Q
        indices = track_by_embeds(embeds[None], ema_alpha=ema)  # (1, T, Q)
        logits = apply_track_indices(logits[None], indices)[0]
        fv = frame_valid[:, None, None].astype(logits.dtype)
        if arch.startswith("OV2Seg"):
            from openvis_tpu.models.meta.ov2seg import (
                ov2seg_eval_scores,
                ov2seg_frame_gate,
            )

            obj = apply_track_indices(obj_logits[None], indices)[0]
            video, per_frame = ov2seg_eval_scores(logits, obj)
            out = inference_video_topk(
                video, masks, topk, track_indices=indices[0]
            )
            pf_sel = jnp.take_along_axis(
                per_frame[:, out["query_idx"]],
                out["labels"][None, :, None], axis=-1,
            )[..., 0]                                      # (T, topk)
            out["mask_logits"] = ov2seg_frame_gate(
                out["mask_logits"], out["scores"], pf_sel
            )
            return out
        mean_logits = (logits * fv).sum(0) / jnp.maximum(fv.sum(0), 1.0)
        probs = jax.nn.softmax(mean_logits, axis=-1)
        if arch.startswith(("SimpleBaseline", "SAN", "MinVIS", "VideoMask",
                            "BriVIS")):
            probs = probs[..., :-1]                        # drop bg column
        return inference_video_topk(probs, masks, topk,
                                    track_indices=indices[0])

    return fn


def _host_videos(cfg: Config, dataset_name: str, max_videos):
    """Yield this process's stride of the test videos.

    Multi-host eval partitioning (reference shards videos across ranks and
    gathers predictions, ``openvis/data/evals/ytvis_eval.py:117-135``):
    process p evaluates videos p, p+P, p+2P, ...; ``_finalize`` gathers the
    per-rank predictions before scoring.  ``max_videos`` counts GLOBALLY so
    semantics match the single-host run."""
    pidx, pcount = jax.process_index(), jax.process_count()
    for i, item in enumerate(test_videos(cfg, dataset_name)):
        if max_videos is not None and i >= max_videos:
            break
        if i % pcount == pidx:
            yield item


_seen_buckets = set()


def _log_bucket(kind: str, tb: int):
    """Each new (kind, time-bucket) pair is a fresh XLA trace — on the real
    TPU that is a multi-minute compile through the remote tunnel, so make
    every new bucket visible (Weak #7: bounding eval compile count).
    ``_bucket``'s step-8 rounding caps the number of buckets at
    max_frames/8 per kind."""
    key = (kind, tb)
    if key not in _seen_buckets:
        _seen_buckets.add(key)
        logger.info("new eval time bucket %s t=%d (fresh XLA trace/compile)",
                    kind, tb)


def _bucket(n: int, step: int = 8) -> int:
    return max(step, -(-n // step) * step)


_OFFLINE_ARCHS = (
    "VideoMaskFormer", "SimpleBaseline", "OpenVIS", "SAN", "BriVIS", "MasQCLIP",
)


def is_single_shot(arch: str) -> bool:
    """Offline (clip-level) meta-archs evaluate the whole (bucketed) video in
    one forward — BriVIS's temporal resampler and MasQCLIP's frame-averaged
    fusion need the full sequence (brivis.py:267-316, masqclip.py:186-199)."""
    return arch in _OFFLINE_ARCHS


def make_single_shot_fn(cfg: Config, model, pre_topk: bool = False):
    """``pre_topk`` returns ``(probs (Q, K), masks (Q, T, h, w))`` for ALL
    queries instead of the fused top-k — the SimpleBSL ensemble must score
    every query with CLIP crops before selection (simplebsl.py:118-121)."""
    arch = cfg.model.meta_architecture
    topk = cfg.model.test.topk_per_video

    def fn(params, frames, text_feats, frame_valid):
        t = frames.shape[0]
        out = model.apply({"params": params}, frames, t, text_feats)
        masks = out["pred_masks"][0]                     # (Q, T, h, w)
        if arch == "MasQCLIP":
            from openvis_tpu.models.meta.masqclip import masqclip_eval_scores

            probs = masqclip_eval_scores(out)[0]         # (Q, K)
        else:
            logits = out["pred_logits"]
            if logits.ndim == 4:                         # (B, T, Q, C): frame head
                fv = frame_valid[None, :, None, None].astype(logits.dtype)
                logits = (logits * fv).sum(1) / jnp.maximum(fv.sum(1), 1.0)
            logits = logits[0]                           # (Q, C)
            probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
        if pre_topk:
            return probs, masks
        return inference_video_topk(probs, masks, topk)

    return fn


def make_single_shot_window_fn(cfg: Config, model):
    """Per-window raw outputs for offline archs on videos LONGER than
    ``test.max_frames`` — the reference's ``run_window_inference``
    decomposition (``san.py:285-307``, ``simplebsl.py:237-238``,
    ``minvis.py:340-362``): each window runs the full forward independently
    (query slots carry identity across windows), masks concatenate over T,
    and class scores average over frames across all windows.

    Returns ``(score_acc (Q, K|C), masks (Q, W, h, w))``; ``score_acc`` is
    pre-normalized by the window's valid-frame count so the caller can sum
    across windows and divide by T (= the reference's full-video
    ``pred_logits.mean(dim=1)``, ``simplebsl.py:277``)."""
    arch = cfg.model.meta_architecture
    window = window_size(cfg)

    def fn(params, frames, text_feats, frame_valid):
        out = model.apply({"params": params}, frames, window, text_feats)
        masks = out["pred_masks"][0]                     # (Q, W, h, w)
        nvalid = frame_valid.sum().astype(jnp.float32)
        if arch == "MasQCLIP":
            from openvis_tpu.models.meta.masqclip import masqclip_eval_scores

            # fused probs are frame-averaged inside the window; weight by
            # the window's valid count so the cross-window mean is over
            # frames (windowed delta: the log-softmax fusion sees window
            # rather than full-video means, masqclip.py:186-216)
            return masqclip_eval_scores(out)[0] * nvalid, masks
        logits = out["pred_logits"]
        if logits.ndim == 4:                             # (B, T, Q, C)
            fv = frame_valid[None, :, None, None].astype(logits.dtype)
            return (logits * fv).sum(1)[0], masks        # summed over frames
        return logits[0] * nvalid, masks                 # clip-level head

    return fn


def evaluate_dataset(
    cfg: Config,
    model,
    params,
    dataset_name: str,
    text_feats: np.ndarray,
    max_videos: Optional[int] = None,
    clip_visual_apply=None,
    mesh=None,
) -> Dict[str, float]:
    arch = cfg.model.meta_architecture
    info = catalog.get(dataset_name)
    evaluator = make_evaluator(info)

    # AMP eval (reference autocast, train_net.py:241-242): one param cast
    # up front covers every sub-path below; frames/text cast at transfer
    params = amp_cast(cfg, params)

    # eval never reads aux-layer logits; for SAN/BriVIS that skips the
    # (L+1)x CLIP post-encode per window (san.py:74-92 is train-only)
    if getattr(model, "supervise_aux_logits", False):
        model = model.clone(supervise_aux_logits=False)

    if arch == "BriVIS" and cfg.model.resampler.name in ("temporal", "decoupled"):
        # the decoupled resampler's heads never feed back into its layers,
        # so it shares the temporal variant's exact split decomposition
        # (final_embeds over the full sequence + per-window heads)
        return _evaluate_brivis_windowed(
            cfg, model, params, dataset_name, text_feats, max_videos, evaluator
        )
    if arch == "BriVIS" and cfg.model.resampler.name == "raw":
        return _evaluate_brivis_raw_windowed(
            cfg, model, params, dataset_name, text_feats, max_videos, evaluator
        )
    if is_single_shot(arch):
        return _evaluate_single_shot(
            cfg, model, params, dataset_name, text_feats, max_videos,
            evaluator, clip_visual_apply=clip_visual_apply,
        )

    window = window_size(cfg)
    window_fn = jax.jit(make_window_fn(cfg, model))
    post_fn = jax.jit(make_postprocess_fn(cfg))
    openvis_score_fn = None
    ensemble = False
    if arch.startswith("OpenVIS"):
        assert clip_visual_apply is not None, "OpenVIS eval needs CLIP visual"
        openvis_score_fn = jax.jit(make_openvis_score_fn(cfg, clip_visual_apply))
    elif (
        arch.startswith("SimpleBaseline")
        and cfg.model.clip_adapter.clip_ensemble
        and clip_visual_apply is not None
    ):
        # SimpleBSL's open_vocabulary_ensemble (simplebsl.py:122-163): the
        # same chunked mask-crop CLIP scoring as OpenVIS, geometrically
        # combined with the model's own text-matching scores below
        ensemble = True
        openvis_score_fn = jax.jit(make_openvis_score_fn(cfg, clip_visual_apply))
    text = jnp.asarray(text_feats, eval_dtype(cfg))
    text_crop, crop_has_bg = text, False
    if ensemble:
        text_crop, crop_has_bg = crop_text_with_bg(cfg, params, text)

    # eval-time mesh sharding: groups of `ndev` windows run as one sharded
    # window-batch (the per-frame stack is data-parallel over windows).
    # Multi-host: videos are strided per process (_host_videos), so each
    # process must run an INDEPENDENT program — restrict the mesh to local
    # devices (a global mesh would need lockstep identical videos per host)
    if jax.process_count() > 1 and mesh is not None:
        local = np.asarray(jax.local_devices())
        if local.size > 1:
            from jax.sharding import Mesh

            mesh = Mesh(local, ("data",))
        else:
            mesh = None
    ndev = 1
    shard = repl = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = int(mesh.devices.size)
        # window groups shard over EVERY mesh axis — with a ("data", "time")
        # mesh (parallel.time_axis > 1) consecutive windows of a video land
        # on the time axis (sequence parallelism at window granularity)
        shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        text = jax.device_put(text, repl)

    for rec, sample in _host_videos(cfg, dataset_name, max_videos):
        frames = sample["pixels"]  # (T, H, W, 3) numpy
        t = frames.shape[0]
        # fixed-size windows (tail padded by repeating the last frame)
        chunks, keeps = [], []
        for i in range(0, t, window):
            chunk = frames[i : i + window]
            pad = window - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            chunks.append(chunk)
            keeps.append(window - pad)
        parts = {"logits": [], "masks": [], "embeds": [], "obj_logits": []}
        # pipelined dispatch: enqueue up to PIPELINE window groups before
        # materializing, so the per-call dispatch latency (the remote-TPU
        # tunnel adds ~35 ms/round trip) overlaps with on-device compute of
        # later windows.  Depth-capped so long videos don't accumulate all
        # window outputs on device.
        PIPELINE = 4
        pending = []

        def _drain(entry):
            out, gi, ng, gpad = entry
            for wi in range(ng - gpad):
                keep = keeps[gi + wi]
                parts["masks"].append(np.asarray(out["masks"][wi, :, :keep]))
                parts["embeds"].append(np.asarray(out["embeds"][wi, :keep]))
                parts["logits"].append(np.asarray(out["logits"][wi, :keep]))
                if "obj_logits" in out:
                    parts["obj_logits"].append(
                        np.asarray(out["obj_logits"][wi, :keep])
                    )

        for gi in range(0, len(chunks), ndev):
            grp = chunks[gi : gi + ndev]
            gpad = ndev - len(grp)
            if gpad:
                grp = grp + [grp[-1]] * gpad
            frames_g = jnp.asarray(np.concatenate(grp), eval_dtype(cfg))  # (G*W,H,Wd,3)
            if shard is not None:
                frames_g = jax.device_put(frames_g, shard)
            pending.append((window_fn(params, frames_g, text), gi, len(grp),
                            gpad))
            if len(pending) >= PIPELINE:
                _drain(pending.pop(0))
        for entry in pending:
            _drain(entry)
        logits = np.concatenate(parts["logits"], axis=0)     # (T, Q, C)
        masks = np.concatenate(parts["masks"], axis=1)       # (Q, T, h, w)
        embeds = np.concatenate(parts["embeds"], axis=0)     # (T, Q, C)
        obj = (
            np.concatenate(parts["obj_logits"], axis=0)
            if parts["obj_logits"] else None
        )

        tb = _bucket(t)
        _log_bucket("postprocess", tb)
        fv = np.zeros((tb,), bool)
        fv[:t] = True
        if tb > t:
            logits = np.concatenate([logits, logits[-1:].repeat(tb - t, 0)])
            embeds = np.concatenate([embeds, embeds[-1:].repeat(tb - t, 0)])
            masks = np.concatenate([masks, masks[:, -1:].repeat(tb - t, 1)], axis=1)
            if obj is not None:
                obj = np.concatenate([obj, obj[-1:].repeat(tb - t, 0)])
        if openvis_score_fn is None:
            kwargs = {}
            if obj is not None:
                kwargs["obj_logits"] = jnp.asarray(obj)
            topk_out = post_fn(
                jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(embeds),
                jnp.asarray(fv), **kwargs,
            )
            topk_np = {k: np.asarray(v) for k, v in topk_out.items()}
        else:  # mask-crop CLIP scoring: replaces the generic scores
            # (OpenVIS) or ensembles with them (SimpleBSL) — track once,
            # skip the generic postprocess entirely.
            # aligned masks for ALL queries, then CLIP-score per chunk
            indices = track_by_embeds(jnp.asarray(embeds)[None])
            aligned = np.asarray(apply_track_indices(
                jnp.asarray(np.swapaxes(masks, 0, 1))[None], indices
            )[0])                                           # (Tb, Q, h, w)
            clip_lg, clip_vd = _clip_crop_scores(
                openvis_score_fn, _raw_frames(cfg, sample["pixels"]),
                aligned, text_crop, window, t,
            )
            if ensemble:
                # generic SimpleBSL scores over the tracked sequence
                # (mean-of-logits over valid frames, softmax minus the
                # model's own bg column, simplebsl.py:276-285), then the
                # geometric-mean combination with the CLIP crop probs
                al = apply_track_indices(jnp.asarray(logits)[None], indices)[0]
                fvx = jnp.asarray(fv)[:, None, None].astype(al.dtype)
                mean_logits = (al * fvx).sum(0) / jnp.maximum(fvx.sum(0), 1.0)
                scores = jax.nn.softmax(mean_logits, axis=-1)[..., :-1]
                scores = apply_clip_ensemble(
                    scores, clip_lg, clip_vd,
                    cfg.model.clip_adapter.clip_ensemble_weight,
                    drop_last=crop_has_bg,
                )
            else:
                from openvis_tpu.models.clip_adapter import frame_average_scores

                scores, qvalid = frame_average_scores(
                    clip_lg, clip_vd, mode="logits_then_softmax",
                )
                scores = jnp.where(qvalid[:, None], scores, 0.0)
            topk_out = inference_video_topk(
                scores, jnp.asarray(aligned[:tb]).swapaxes(0, 1),
                cfg.model.test.topk_per_video,
            )
            topk_np = {k: np.asarray(v) for k, v in topk_out.items()}

        # upsample 1/4-res mask logits to the padded input resolution on host
        mk = topk_np["mask_logits"][:, :t]                 # (topk, T, h, w)
        ph, pw = sample["pixels"].shape[1:3]
        up = resize_bilinear_torch_hw(jnp.asarray(mk, jnp.float32), (ph, pw))
        topk_np["mask_logits"] = np.asarray(up)
        _emit(evaluator, rec["video_id"], topk_np,
              sample["image_size"], sample["orig_size"])

    return _finalize(cfg, dataset_name, evaluator)


def _finalize(cfg: Config, dataset_name: str, evaluator) -> Dict[str, float]:
    info = catalog.get(dataset_name)
    pidx, pcount = jax.process_index(), jax.process_count()
    if pcount > 1:
        # gather the per-rank video stride (reference's comm.gather +
        # rank-0 scoring, ytvis_eval.py:117-135) via the shared output_dir
        assert cfg.output_dir, "multi-host eval needs a shared output_dir"
        os.makedirs(cfg.output_dir, exist_ok=True)
        rank_path = os.path.join(
            cfg.output_dir, f"results_{dataset_name}.rank{pidx}.json"
        )
        with open(rank_path, "w") as f:
            json.dump(evaluator.predictions, f)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"eval_gather_{dataset_name}")
        if pidx != 0:
            return {}
        merged = []
        for r in range(pcount):
            with open(os.path.join(
                cfg.output_dir, f"results_{dataset_name}.rank{r}.json"
            )) as f:
                merged.extend(json.load(f))
        evaluator.predictions = merged
    # dump raw predictions next to metrics (ytvis_eval.py:136-175)
    if cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        path = os.path.join(cfg.output_dir, f"results_{dataset_name}.json")
        with open(path, "w") as f:
            json.dump(evaluator.predictions, f)
        logger.info("wrote %d predictions to %s",
                    len(evaluator.predictions), path)

    if isinstance(evaluator, BURSTEvaluator):
        from openvis_tpu.data.mapper import load_burst_records

        gts = []
        for rec in load_burst_records(info, cfg.datasets.root):
            for ann in rec["annotations"]:
                gts.append({
                    "video_id": rec["video_id"],
                    "category_id": ann["category_id"],
                    "segmentations": ann["segmentations"],
                })
        if not gts:
            logger.warning("%s has no GT tracks; predictions only",
                           dataset_name)
            return {"num_predictions": float(len(evaluator.predictions))}
        return evaluator.evaluate(gts, sorted(info.id_map))

    gt_path = os.path.join(cfg.datasets.root, info.json_file)
    with open(gt_path) as f:
        gt_json = json.load(f)
    if not gt_json.get("annotations"):
        logger.warning("%s has no GT annotations; writing predictions only",
                       dataset_name)
        return {"num_predictions": float(len(evaluator.predictions))}
    metrics = evaluator.evaluate(gt_json)
    per_cat = getattr(evaluator, "per_category", None)
    if per_cat and cfg.output_dir:
        with open(os.path.join(
            cfg.output_dir, f"percat_{dataset_name}.json"
        ), "w") as f:
            json.dump(per_cat, f)
        shown = sorted(
            ((n, v) for n, v in per_cat.items() if v == v),
            key=lambda kv: -kv[1],
        )
        table = "\n".join(f"  {n:<28s} {v * 100:6.2f}" for n, v in shown)
        logger.info("per-category AP (%s):\n%s", dataset_name, table)
    return metrics


def _evaluate_brivis_windowed(
    cfg, model, params, dataset_name, text_feats, max_videos, evaluator
) -> Dict[str, float]:
    """BriVIS long-video inference WITHOUT truncation: the frozen per-frame
    stack runs in fixed-size windows, the temporal resampler runs once over
    the full concatenated (small) query embeds, and the mask/CLIP heads run
    per window again.  Resolves the reference's inconsistent windowed path
    (brivis.py:267-316 calls the Raw resampler's signature on the Temporal
    resampler; SURVEY §3.3) the way its data flow intends."""
    window = window_size(cfg)
    topk = cfg.model.test.topk_per_video
    text = jnp.asarray(text_feats, eval_dtype(cfg))

    stack_fn = jax.jit(
        lambda p, f: model.apply({"params": p}, f, f.shape[0],
                                 method="frame_stack")
    )
    resample_fn = jax.jit(
        lambda p, e: model.apply({"params": p}, e, method="resample")
    )
    predict_fn = jax.jit(
        lambda p, e, mf, af, bk, tx: model.apply(
            {"params": p}, e, mf, af, bk, tx, method="predict_window"
        )
    )

    for rec, sample in _host_videos(cfg, dataset_name, max_videos):
        frames = sample["pixels"]  # (T, H, W, 3) numpy
        t = frames.shape[0]
        parts = {"embeds": [], "mask_feats": [], "attn_feats": [],
                 "bk_tokens": []}
        for i in range(0, t, window):
            chunk = frames[i : i + window]
            pad = window - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = stack_fn(params, jnp.asarray(chunk, eval_dtype(cfg)))
            keep = window - pad
            parts["embeds"].append(np.asarray(out["pred_embeds"][0, :keep]))
            parts["mask_feats"].append(np.asarray(out["mask_feats"][:keep]))
            parts["attn_feats"].append(np.asarray(out["attn_feats"][:keep]))
            parts["bk_tokens"].append(np.asarray(out["bk_tokens"][:keep]))
        embeds = np.concatenate(parts["embeds"], axis=0)        # (T, Q, C)
        mask_feats = np.concatenate(parts["mask_feats"], axis=0)
        attn_feats = np.concatenate(parts["attn_feats"], axis=0)
        bk_tokens = np.concatenate(parts["bk_tokens"], axis=0)

        # pad the time axis to a bucket so the resampler trace count stays
        # bounded; NO max_frames truncation — every frame contributes
        tb = _bucket(t)
        _log_bucket("brivis_resample", tb)
        if tb > t:
            embeds = np.concatenate([embeds, embeds[-1:].repeat(tb - t, 0)])
            mask_feats = np.concatenate(
                [mask_feats, mask_feats[-1:].repeat(tb - t, 0)]
            )
            attn_feats = np.concatenate(
                [attn_feats, attn_feats[-1:].repeat(tb - t, 0)]
            )
            bk_tokens = np.concatenate(
                [bk_tokens, bk_tokens[-1:].repeat(tb - t, 0)]
            )

        # MinVIS alignment over the FULL sequence (brivis.py:173-174)
        indices = track_by_embeds(jnp.asarray(embeds)[None])    # (1, Tb, Q)
        aligned = apply_track_indices(jnp.asarray(embeds)[None], indices)
        final = resample_fn(params, aligned)                    # (1, Tb, Q, C)
        final_np = np.asarray(final[0])

        masks_parts, logits_parts = [], []
        for i in range(0, tb, window):
            j = min(i + window, tb)
            pad = window - (j - i)
            sl = slice(i, j)

            def _pad(a):
                return (
                    np.concatenate([a[sl], a[j - 1 : j].repeat(pad, 0)])
                    if pad else a[sl]
                )

            m, lg = predict_fn(
                params, jnp.asarray(_pad(final_np)),
                jnp.asarray(_pad(mask_feats)), jnp.asarray(_pad(attn_feats)),
                jnp.asarray(_pad(bk_tokens)), text,
            )
            keep = window - pad
            masks_parts.append(np.asarray(m[:keep]))
            logits_parts.append(np.asarray(lg[:keep]))
        masks = np.concatenate(masks_parts, axis=0)      # (Tb, Q, h, w)
        logits = np.concatenate(logits_parts, axis=0)    # (Tb, Q, K+1)

        fv = np.zeros((tb, 1, 1), np.float32)
        fv[:t] = 1.0
        mean_logits = (logits * fv).sum(0) / max(float(fv.sum()), 1.0)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(mean_logits), -1))
        probs = probs[..., :-1]                          # drop bg column
        topk_out = inference_video_topk(
            jnp.asarray(probs), jnp.asarray(np.swapaxes(masks, 0, 1)), topk
        )
        topk_np = {k: np.asarray(v) for k, v in topk_out.items()}
        mk = topk_np["mask_logits"][:, :t]
        ph, pw = sample["pixels"].shape[1:3]
        up = resize_bilinear_torch_hw(jnp.asarray(mk, jnp.float32), (ph, pw))
        topk_np["mask_logits"] = np.asarray(up)
        _emit(evaluator, rec["video_id"], topk_np,
              sample["image_size"], sample["orig_size"])
    return _finalize(cfg, dataset_name, evaluator)


def _evaluate_brivis_raw_windowed(
    cfg, model, params, dataset_name, text_feats, max_videos, evaluator
) -> Dict[str, float]:
    """BriVIS + raw resampler long-video inference — the reference's OWN
    windowed path for this class (``resampler.py:406-516``): per resampler
    layer the temporal (long/short) half runs over the FULL concatenated
    sequence of query embeds, while the per-frame cross-attention half runs
    window-by-window against that window's multi-scale pixel tokens (frames
    never mix in the cross-attention, so the decomposition is exact; the
    reference's ``attn_mask`` is dead code — ``memory_mask=None``)."""
    window = window_size(cfg)
    topk = cfg.model.test.topk_per_video
    nlayers = cfg.model.resampler.num_layers
    nlvl = 3
    text = jnp.asarray(text_feats, eval_dtype(cfg))

    stack_fn = jax.jit(
        lambda p, f: model.apply({"params": p}, f, f.shape[0],
                                 method="frame_stack")
    )
    temporal_fns = [
        jax.jit(lambda p, x, i=i: model.apply(
            {"params": p}, x, i, method="raw_temporal"))
        for i in range(nlayers)
    ]
    frame_fns = [
        jax.jit(lambda p, pf, mf, mp, i=i: model.apply(
            {"params": p}, pf, mf, mp, i, method="raw_frame"))
        for i in range(nlayers)
    ]

    def _predict(p, pf, mf, af, bk, tx):
        e = model.apply({"params": p}, pf, method="raw_finalize")
        return model.apply({"params": p}, e, mf, af, bk, tx,
                           method="predict_window")

    predict_fn = jax.jit(_predict)

    for rec, sample in _host_videos(cfg, dataset_name, max_videos):
        frames = sample["pixels"]  # (T, H, W, 3) numpy
        t = frames.shape[0]
        keys = (["pred_embeds", "mask_feats", "attn_feats", "bk_tokens"]
                + [f"ms_feats{l}" for l in range(nlvl)])
        parts = {k: [] for k in keys}
        ms_pos = None
        for i in range(0, t, window):
            chunk = frames[i : i + window]
            pad = window - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = stack_fn(params, jnp.asarray(chunk, eval_dtype(cfg)))
            keep = window - pad
            parts["pred_embeds"].append(np.asarray(out["pred_embeds"][0, :keep]))
            for k in keys[1:]:
                parts[k].append(np.asarray(out[k][:keep]))
            if ms_pos is None:
                ms_pos = [jnp.asarray(np.asarray(out[f"ms_pos{l}"]))
                          for l in range(nlvl)]
        cat = {k: np.concatenate(v, axis=0) for k, v in parts.items()}

        tb = _bucket(t)
        _log_bucket("brivis_raw_resample", tb)
        if tb > t:
            for k in cat:
                cat[k] = np.concatenate(
                    [cat[k], cat[k][-1:].repeat(tb - t, 0)]
                )

        # MinVIS alignment over the FULL sequence (brivis.py:173-174)
        embeds = cat["pred_embeds"]                             # (Tb, Q, C)
        q, c = embeds.shape[1:]
        indices = track_by_embeds(jnp.asarray(embeds)[None])    # (1, Tb, Q)
        aligned = np.asarray(
            apply_track_indices(jnp.asarray(embeds)[None], indices)[0]
        )

        # interleaved layer loop: full-sequence temporal half + per-window
        # frame half at level i % 3
        x = np.ascontiguousarray(np.swapaxes(aligned, 0, 1))    # (Q, Tb, C)
        for i in range(nlayers):
            x = np.asarray(temporal_fns[i](params, jnp.asarray(x)))
            # np.array copies: jax buffer views are read-only and
            # ascontiguousarray would return the same read-only array
            pf = np.array(np.swapaxes(x, 0, 1))                 # (Tb, Q, C)
            lvl = i % nlvl
            for j in range(0, tb, window):
                k = min(j + window, tb)
                pad = window - (k - j)
                blk = pf[j:k]
                mf = cat[f"ms_feats{lvl}"][j:k]
                if pad:
                    blk = np.concatenate([blk, blk[-1:].repeat(pad, 0)])
                    mf = np.concatenate([mf, mf[-1:].repeat(pad, 0)])
                o = np.asarray(frame_fns[i](
                    params, jnp.asarray(blk), jnp.asarray(mf), ms_pos[lvl]
                ))
                pf[j:k] = o[: k - j]
            x = np.ascontiguousarray(np.swapaxes(pf, 0, 1))

        final = np.ascontiguousarray(np.swapaxes(x, 0, 1))      # (Tb, Q, C)
        masks_parts, logits_parts = [], []
        for i in range(0, tb, window):
            j = min(i + window, tb)
            pad = window - (j - i)

            def _pad(a):
                return (
                    np.concatenate([a[i:j], a[j - 1 : j].repeat(pad, 0)])
                    if pad else a[i:j]
                )

            m, lg = predict_fn(
                params, jnp.asarray(_pad(final)),
                jnp.asarray(_pad(cat["mask_feats"])),
                jnp.asarray(_pad(cat["attn_feats"])),
                jnp.asarray(_pad(cat["bk_tokens"])), text,
            )
            keep = window - pad
            masks_parts.append(np.asarray(m[:keep]))
            logits_parts.append(np.asarray(lg[:keep]))
        masks = np.concatenate(masks_parts, axis=0)      # (Tb, Q, h, w)
        logits = np.concatenate(logits_parts, axis=0)    # (Tb, Q, K+1)

        fv = np.zeros((tb, 1, 1), np.float32)
        fv[:t] = 1.0
        mean_logits = (logits * fv).sum(0) / max(float(fv.sum()), 1.0)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(mean_logits), -1))
        probs = probs[..., :-1]                          # drop bg column
        topk_out = inference_video_topk(
            jnp.asarray(probs), jnp.asarray(np.swapaxes(masks, 0, 1)), topk
        )
        topk_np = {k: np.asarray(v) for k, v in topk_out.items()}
        mk = topk_np["mask_logits"][:, :t]
        ph, pw = sample["pixels"].shape[1:3]
        up = resize_bilinear_torch_hw(jnp.asarray(mk, jnp.float32), (ph, pw))
        topk_np["mask_logits"] = np.asarray(up)
        _emit(evaluator, rec["video_id"], topk_np,
              sample["image_size"], sample["orig_size"])
    return _finalize(cfg, dataset_name, evaluator)


def _evaluate_single_shot(
    cfg, model, params, dataset_name, text_feats, max_videos, evaluator,
    clip_visual_apply=None,
) -> Dict[str, float]:
    arch = cfg.model.meta_architecture
    topk = cfg.model.test.topk_per_video
    # offline SimpleBaseline ensembles like the online variant
    # (simplebsl.py:118-121): CLIP crop probs fold into every query's
    # scores BEFORE top-k selection
    ensemble = (
        arch == "SimpleBaseline"
        and cfg.model.clip_adapter.clip_ensemble
        and clip_visual_apply is not None
    )
    fn = jax.jit(make_single_shot_fn(cfg, model, pre_topk=ensemble))
    window_fn = jax.jit(make_single_shot_window_fn(cfg, model))
    window = window_size(cfg)
    text = jnp.asarray(text_feats, eval_dtype(cfg))
    score_fn = text_crop = None
    crop_has_bg = False
    if ensemble:
        score_fn = jax.jit(make_openvis_score_fn(cfg, clip_visual_apply))
        text_crop, crop_has_bg = crop_text_with_bg(cfg, params, text)

    def _ensembled_topk(probs, masks_all, pixels, t):
        clip_lg, clip_vd = _clip_crop_scores(
            score_fn, _raw_frames(cfg, pixels),
            np.swapaxes(np.asarray(masks_all), 0, 1), text_crop, window, t,
        )
        scores = apply_clip_ensemble(
            probs, clip_lg, clip_vd,
            cfg.model.clip_adapter.clip_ensemble_weight,
            drop_last=crop_has_bg,
        )
        return inference_video_topk(scores, jnp.asarray(masks_all), topk)

    for rec, sample in _host_videos(cfg, dataset_name, max_videos):
        frames = sample["pixels"]
        t = frames.shape[0]
        tb = _bucket(t)
        if tb <= cfg.model.test.max_frames:
            _log_bucket("single_shot", tb)
            if tb > t:
                frames = np.concatenate(
                    [frames, frames[-1:].repeat(tb - t, 0)]
                )
            fv = np.zeros((tb,), bool)
            fv[:t] = True
            out = fn(params, jnp.asarray(frames, eval_dtype(cfg)), text,
                     jnp.asarray(fv))
            if ensemble:
                probs, masks_all = out
                topk_out = _ensembled_topk(probs, masks_all,
                                           sample["pixels"], t)
            else:
                topk_out = out
        else:
            # longer than the single-shot cap: the reference's windowed
            # decomposition (run_window_inference) — NO frame is dropped
            logging.getLogger(__name__).info(
                "video %s: t=%d > max_frames=%d, windowed offline eval",
                rec["video_id"], t, cfg.model.test.max_frames,
            )
            acc = None
            mparts = []
            for i in range(0, t, window):
                chunk = frames[i : i + window]
                pad = window - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, chunk[-1:].repeat(pad, 0)]
                    )
                wfv = np.zeros((window,), bool)
                wfv[: window - pad] = True
                lg, mk = window_fn(
                    params, jnp.asarray(chunk, eval_dtype(cfg)), text,
                    jnp.asarray(wfv)
                )
                acc = lg if acc is None else acc + lg
                mparts.append(np.asarray(mk[:, : window - pad]))
            masks = np.concatenate(mparts, axis=1)       # (Q, T, h, w)
            if tb > t:
                masks = np.concatenate(
                    [masks, masks[:, -1:].repeat(tb - t, 1)], axis=1
                )
            if arch == "MasQCLIP":
                probs = jnp.asarray(acc) / t             # already fused probs
            else:
                probs = jax.nn.softmax(
                    jnp.asarray(acc) / t, axis=-1
                )[..., :-1]
            if ensemble:
                topk_out = _ensembled_topk(probs, masks, sample["pixels"], t)
            else:
                topk_out = inference_video_topk(
                    probs, jnp.asarray(masks), topk
                )
        topk_np = {k: np.asarray(v) for k, v in topk_out.items()}
        mk = topk_np["mask_logits"][:, :t]
        ph, pw = sample["pixels"].shape[1:3]
        up = resize_bilinear_torch_hw(jnp.asarray(mk, jnp.float32), (ph, pw))
        topk_np["mask_logits"] = np.asarray(up)
        _emit(evaluator, rec["video_id"], topk_np,
              sample["image_size"], sample["orig_size"])
    return _finalize(cfg, dataset_name, evaluator)
