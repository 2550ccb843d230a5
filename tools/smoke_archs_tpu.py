"""Drive every meta-architecture's forward + loss + grad on the REAL TPU.

The CPU test suite covers all 8 families functionally, but TPU-only paths
(Pallas MSDA fwd/bwd, Pallas Hungarian, Mosaic layouts) only engage on the
chip — and some XLA patterns that work on CPU crash the TPU worker (e.g.
multi-dim strided gathers, see CLAUDE.md).  This smoke runs each family
once at tiny shapes and asserts finite outputs/losses/grads.

    python tools/smoke_archs_tpu.py [--tiny]   # --tiny = CPU (debug)
Prints one JSON line per arch.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K, D = 5, 32
B, H, W, N = 1, 64, 96, 4


def make_cfg(meta: str):
    from openvis_tpu.config import Config

    decoder = {
        "VideoMaskFormer": "video",
        "MinVIS": "frame",
        "SimpleBaselineOnline": "frame_embedding",
        "SimpleBaseline": "video_embedding",
        "OpenVISOnline": "frame_proposal",
        "SANOnline": "side_adapter_frame",
        "BriVIS": "side_adapter_frame",
        "MasQCLIP": "video_proposal",
        "OV2Seg": "ov2seg_frame",
    }[meta]
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        meta_architecture=meta,
        num_classes=1 if meta.startswith("OpenVIS") else K,
        freeze_segmenter=(meta == "BriVIS"),
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, conv_dim=64, mask_dim=64,
            transformer_enc_layers=1, dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, name=decoder,
            hidden_dim=64, num_queries=8, nheads=4, dim_feedforward=128,
            dec_layers=2, mask_dim=64, clip_embed_dim=D,
        ),
        clip_adapter=dataclasses.replace(
            cfg.model.clip_adapter, clip_model_name="test-tiny",
            clip_num_heads=4, clip_embed_dims=D, broken_id=3,
            merge_ids=(1, 2, 3),
        ),
        resampler=dataclasses.replace(cfg.model.resampler, num_layers=2),
        criterion=dataclasses.replace(cfg.model.criterion, train_num_points=128),
    )
    s = dataclasses.replace(cfg.solver, warmup_iters=0)
    return dataclasses.replace(cfg, model=m, solver=s)


def run_arch(meta: str):
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import build_model, make_loss_fn

    T = 3 if meta == "BriVIS" else 2   # brownian bridge needs >= 3 frames
    cfg = make_cfg(meta)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    labels = rng.randint(0, cfg.model.num_classes, (B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), np.float32)
    masks[:, 0, :, 5:20, 5:30] = 1.0
    masks[:, 1, :, 35:55, 50:85] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :2] = True
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    batch = {
        "pixels": jnp.asarray(rng.randn(B, T, H, W, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(labels), masks=jnp.asarray(masks),
            valid=jnp.asarray(valid),
            frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
        ),
        "text_feats": jnp.asarray(text),
    }
    frames = batch["pixels"].reshape(B * T, H, W, 3)
    params = model.init(jax.random.PRNGKey(0), frames, T, batch["text_feats"])[
        "params"
    ]

    # forward (eval dtype path)
    out = jax.jit(
        lambda p, f, tx: model.apply({"params": p}, f, T, tx)
    )(params, frames, batch["text_feats"])
    pm = np.asarray(out["pred_masks"], np.float32)
    assert np.isfinite(pm).all(), "non-finite pred_masks"

    # loss + grad (bf16 AMP like training)
    loss_fn = make_loss_fn(cfg, model, K)
    loss, _ = jax.jit(loss_fn)(params, batch, jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    grads = jax.jit(jax.grad(lambda p, b, r: loss_fn(p, b, r)[0]))(
        params, batch, jax.random.PRNGKey(1)
    )
    gn = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                     for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gn), "non-finite grad norm"
    return {"loss": round(loss, 3), "grad_norm": round(gn, 3)}


ARCHS = [
    "VideoMaskFormer", "MinVIS", "SimpleBaselineOnline", "SimpleBaseline",
    "OpenVISOnline", "SANOnline", "BriVIS", "MasQCLIP", "OV2Seg",
]


def main(tiny=False):
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    ok = 0
    for meta in ARCHS:
        try:
            res = run_arch(meta)
            ok += 1
            print(json.dumps({"arch": meta, "ok": True, **res}), flush=True)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            print(json.dumps({"arch": meta, "ok": False,
                              "error": str(e)[:200]}), flush=True)
    print(json.dumps({"total_ok": ok, "total": len(ARCHS)}), flush=True)


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv)
