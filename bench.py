"""Benchmark: flagship-model video inference + train-step on one chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
Default run: SimpleBSLOnline R50 inference frames/s + train-step ms.
``--arch san_online`` benches the SAN online path instead (CLIP-post-encode
dominated eval, a different bottleneck profile).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against the north-star proxy: the PyTorch reference's SimpleBSL
online R50 eval loop runs O(10) frames/s/GPU class hardware; until a real
A100 baseline is measured we report the raw TPU numbers and vs_baseline
null.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# XLA-counted model FLOPs at the bench shapes (tools/flops_count.py; CPU
# compile-only so the MSDA op counts its useful work, not the Pallas
# implicit-matmul inflation).  Regenerate with `python tools/flops_count.py`
# after changing model shapes.
_FLOPS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "FLOPS.json")
_FLOPS = json.load(open(_FLOPS_PATH)) if os.path.exists(_FLOPS_PATH) else {}
V5E_BF16_PEAK = 197e12  # dense bf16 FLOP/s per v5e chip


def _mfu_fields(metric: str, calls_per_s: float, tiny: bool = False) -> dict:
    """flops + MFU fields for a metric line; {} when uncounted.  Tiny runs
    skip them: FLOPS.json counts the FULL bench shapes, so pairing it with
    toy-shape timings would print nonsense MFU."""
    ent = _FLOPS.get(metric)
    if not ent or tiny:
        return {}
    return {
        "flops": ent["flops"],
        "mfu": round(ent["flops"] * calls_per_s / V5E_BF16_PEAK, 4),
    }


def _bench_cfg(arch: str, k: int):
    from openvis_tpu.config import Config

    cfg = Config()
    m = dataclasses.replace(cfg.model, num_classes=k)
    if arch in ("san_online", "brivis"):
        m = dataclasses.replace(
            m,
            meta_architecture="SANOnline" if arch == "san_online" else "BriVIS",
            # stage-2 BriVIS trains with the stage-1 segmenter frozen
            # (brivis recipe freeze_segmenter: true; brivis.py:36-41)
            freeze_segmenter=(arch == "brivis"),
            transformer_decoder=dataclasses.replace(
                m.transformer_decoder, name="side_adapter_frame"
            ),
            clip_adapter=dataclasses.replace(
                m.clip_adapter, name="side", clip_model_name="ViT-B/16",
                clip_num_heads=12, merge_ids=(3, 6, 9), broken_id=9,
            ),
        )
    elif arch == "openvis_online":
        # class-agnostic proposals + mask-crop CLIP scoring
        # (openvis_online_R50 recipe; openvis.py:35,110-147)
        m = dataclasses.replace(
            m,
            meta_architecture="OpenVISOnline",
            num_classes=1,
            transformer_decoder=dataclasses.replace(
                m.transformer_decoder, name="frame_proposal"
            ),
            clip_adapter=dataclasses.replace(
                m.clip_adapter, name="clip", clip_model_name="ViT-B/16",
            ),
        )
    return dataclasses.replace(cfg, model=m)


def _bench_inference(cfg, arch, tiny):
    from openvis_tpu.train import build_model, make_eval_fn

    K, D = cfg.model.num_classes, 512
    model = build_model(cfg)
    # eval never reads aux-layer CLIP logits — mirror the engine's eval
    # clone (engine.py:505-506; san.py:74-92 is train-only) or the SAN
    # bench pays (L+1)x the CLIP post-encode per window
    if getattr(model, "supervise_aux_logits", False):
        model = model.clone(supervise_aux_logits=False)
    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    # bf16 params for inference (AMP eval, train_net.py:241-242 equivalent)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    eval_fn = jax.jit(make_eval_fn(cfg, model))

    fb = frames.astype(jnp.bfloat16)
    tb = text.astype(jnp.bfloat16)

    np.asarray(eval_fn(params, fb, tb)["scores"])  # compile + warm
    iters = 3 if tiny else 10
    t0 = time.perf_counter()
    # pipelined dispatch (like engine.evaluate_dataset): enqueue all windows,
    # then materialize — per-call dispatch latency (~35 ms through the
    # remote-TPU tunnel) overlaps with on-device compute.  Materializing to
    # host fences; block_until_ready does not reliably fence the tunnel.
    outs = [eval_fn(params, fb, tb) for _ in range(iters)]
    for o in outs:
        np.asarray(o["scores"])
    dt = time.perf_counter() - t0
    fps = iters * t / dt
    print(json.dumps({
        "metric": f"{arch}_r50_inference",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        **_mfu_fields(f"{arch}_r50_inference", fps / t, tiny),
    }), flush=True)


def _bench_train_step(cfg, arch, tiny):
    """Full jitted train step (fwd + criterion + bwd + optimizer) at the
    reference train shapes — per-chip B=1, T=2 @ 480x864, N=40, 12544 pts,
    bf16 AMP (Base.yaml:21-45)."""
    from openvis_tpu.parallel.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import init_model, make_loss_fn

    K, D = 40, 512
    rng = np.random.RandomState(0)
    # BriVIS trains on T=3 clips (brivis recipe, SAMPLING_FRAME_NUM 3)
    tt = 3 if arch == "brivis" else 2
    t, h, w, n = (tt, 96, 160, 8) if tiny else (tt, 480, 864, 40)
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    batch = {
        "pixels": jnp.asarray(rng.randn(1, t, h, w, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(rng.randint(0, K, (1, n)), jnp.int32),
            masks=jnp.asarray(
                (rng.rand(1, n, t, h, w) > 0.9).astype(np.float32)
            ),
            valid=jnp.ones((1, n), bool),
            frame_valid=jnp.ones((1, n, t), bool),
        ),
        "text_feats": text,
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    key = jax.random.PRNGKey(1)

    # compile + warm, fenced on grad_norm (depends on EVERY grad leaf —
    # total_loss is a forward-only value and can be ready before the
    # backward finishes)
    state, metrics = step(state, batch, key)
    np.asarray(metrics["grad_norm"])

    iters = 2 if tiny else 5
    t0 = time.perf_counter()
    # pipelined step chain (like a real training loop, which never fences
    # per step — metrics log asynchronously): enqueue all steps, fence the
    # LAST step's grad_norm, which depends on every prior state update
    # through the donated-state chain.  Per-call dispatch latency (~35 ms
    # through the remote-TPU tunnel) overlaps with on-device compute.
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    np.asarray(metrics["grad_norm"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({
        "metric": f"{arch}_r50_train_step",
        "value": round(dt, 1),
        "unit": "ms/step",
        "vs_baseline": None,
        **_mfu_fields(f"{arch}_r50_train_step", 1e3 / dt, tiny),
    }), flush=True)


def make_brivis_eval(cfg, tiny):
    """Build the BriVIS windowed-inference closure + example args (the
    engine's staged path: frozen frame stack -> MinVIS alignment ->
    temporal resample -> final-layer heads + biased CLIP; brivis.py:267-316
    as resolved by engine._evaluate_brivis_windowed).  Shared by the bench
    timing loop and tools/flops_count.py (which compile-counts it on CPU)."""
    from openvis_tpu.models.postprocess import inference_video_topk
    from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds
    from openvis_tpu.train import build_model

    K, D = cfg.model.num_classes, 512
    model = build_model(cfg)
    if getattr(model, "supervise_aux_logits", False):
        model = model.clone(supervise_aux_logits=False)
    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    topk = cfg.model.test.topk_per_video

    def eval_fn(params, frames, text):
        out = model.apply({"params": params}, frames, frames.shape[0],
                          method="frame_stack")
        embeds = out["pred_embeds"]                        # (1, T, Q, C)
        idx = track_by_embeds(embeds)
        aligned = apply_track_indices(embeds, idx)
        final = model.apply({"params": params}, aligned, method="resample")
        masks, logits = model.apply(
            {"params": params}, final[0], out["mask_feats"],
            out["attn_feats"], out["bk_tokens"], text,
            method="predict_window",
        )                                                  # (T,Q,H,W),(T,Q,K+1)
        probs = jax.nn.softmax(logits.mean(0), axis=-1)[..., :-1]
        return inference_video_topk(probs, jnp.swapaxes(masks, 0, 1), topk)

    return eval_fn, params, frames.astype(jnp.bfloat16), \
        text.astype(jnp.bfloat16), t


def _bench_brivis_inference(cfg, tiny):
    eval_fn, params, fb, tb, t = make_brivis_eval(cfg, tiny)
    jfn = jax.jit(eval_fn)
    np.asarray(jfn(params, fb, tb)["scores"])  # compile + warm
    iters = 3 if tiny else 10
    t0 = time.perf_counter()
    outs = [jfn(params, fb, tb) for _ in range(iters)]
    for o in outs:
        np.asarray(o["scores"])
    dt = time.perf_counter() - t0
    fps = iters * t / dt
    print(json.dumps({
        "metric": "brivis_r50_inference",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        **_mfu_fields("brivis_r50_inference", fps / t, tiny),
    }), flush=True)


def make_openvis_eval(cfg, tiny):
    """Build the OpenVISOnline eval closure + example args: class-agnostic
    proposals + tracking + chunked mask-crop CLIP classification
    (openvis.py:110-147; the arch the repo is named after), chained in ONE
    jit per window.  Shared by the bench and tools/flops_count.py."""
    from openvis_tpu.engine import make_openvis_score_fn
    from openvis_tpu.models.clip.model import (
        CLIPVisionTransformer, _MODEL_SHAPES,
    )
    from openvis_tpu.models.clip_adapter import frame_average_scores
    from openvis_tpu.models.postprocess import inference_video_topk
    from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds
    from openvis_tpu.train import build_model

    K, D = 40, 512
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    shape = _MODEL_SHAPES[cfg.model.clip_adapter.clip_model_name]
    vis = CLIPVisionTransformer(
        patch_size=shape["vision_patch"], width=shape["vision_width"],
        layers=shape["vision_layers"], heads=shape["vision_heads"],
        embed_dim=shape["embed_dim"], image_size=shape["image_size"],
    )
    vp = vis.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, shape["image_size"], shape["image_size"], 3)),
    )["params"]
    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
    params = jax.tree.map(cast, params)
    vp = jax.tree.map(cast, vp)
    score_fn = make_openvis_score_fn(
        cfg, lambda imgs: vis.apply({"params": vp}, imgs), adapted=False
    )
    topk = cfg.model.test.topk_per_video
    mean = jnp.asarray(cfg.model.pixel_mean)
    std = jnp.asarray(cfg.model.pixel_std)

    def eval_fn(params, frames, text):
        out = model.apply({"params": params}, frames, frames.shape[0], text)
        idx = track_by_embeds(out["pred_embeds"])
        aligned = apply_track_indices(
            jnp.swapaxes(out["pred_masks"], 1, 2), idx
        )[0]                                               # (T, Q, h, w)
        raw = frames * std.astype(frames.dtype) + mean.astype(frames.dtype)
        lg, vd = score_fn(raw, aligned, text)
        scores, qv = frame_average_scores(lg, vd, mode="logits_then_softmax")
        scores = jnp.where(qv[:, None], scores, 0.0)
        return inference_video_topk(scores, jnp.swapaxes(aligned, 0, 1), topk)

    return eval_fn, params, frames.astype(jnp.bfloat16), \
        text.astype(jnp.bfloat16), t


def _bench_openvis_inference(cfg, tiny):
    eval_fn, params, fb, tb, t = make_openvis_eval(cfg, tiny)
    jfn = jax.jit(eval_fn)
    np.asarray(jfn(params, fb, tb)["scores"])  # compile + warm
    iters = 3 if tiny else 10
    t0 = time.perf_counter()
    outs = [jfn(params, fb, tb) for _ in range(iters)]
    for o in outs:
        np.asarray(o["scores"])
    dt = time.perf_counter() - t0
    fps = iters * t / dt
    print(json.dumps({
        "metric": "openvis_online_r50_inference",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        **_mfu_fields("openvis_online_r50_inference", fps / t, tiny),
    }), flush=True)


def _run_arch(arch: str, tiny: bool):
    cfg = _bench_cfg(arch, 40)
    # train-step first, inference LAST: drivers that parse the final JSON
    # line as the headline metric keep the frames/s series (r1: 15.64,
    # r2: 55.43) comparable across rounds.
    if arch in ("simplebsl_online", "san_online", "brivis"):
        _bench_train_step(cfg, arch, tiny)
    if arch == "brivis":
        _bench_brivis_inference(cfg, tiny)
    elif arch == "openvis_online":
        _bench_openvis_inference(cfg, tiny)
    else:
        _bench_inference(cfg, arch, tiny)


def main(tiny: bool = False, arch: str = None):
    if tiny:  # CPU smoke path (sitecustomize pins JAX_PLATFORMS=axon)
        jax.config.update("jax_platforms", "cpu")
    if arch is not None:
        _run_arch(arch, tiny)
        return
    # default driver run: every flagship OV arch, SimpleBSL headline LAST
    # (the driver parses the final JSON line as the round's headline)
    for a in ("san_online", "brivis", "openvis_online"):
        try:
            _run_arch(a, tiny)
        except Exception as e:  # one broken arch must not cost the headline
            print(f"bench {a} failed: {e!r}", file=sys.stderr, flush=True)
    _run_arch("simplebsl_online", tiny)


if __name__ == "__main__":
    arch = None
    if "--arch" in sys.argv:
        arch = sys.argv[sys.argv.index("--arch") + 1]
    main(tiny="--tiny" in sys.argv, arch=arch)
