"""AMP dtype-policy regression: under the train AMP cast (f32 masters,
norm params f32 — train.make_loss_fn), a bf16 forward must STAY bf16.

Flax norms with f32 scale/bias promote bf16 inputs to f32 and, without the
amp_norm cast-back (models/amp.py), every tensor downstream of the first
norm silently runs f32 — measured on v5e-1 as the whole "bf16 AMP" train
step executing in f32 (composed model fwd+bwd 356 ms vs 187 ms genuinely
bf16).  This test captures all intermediates and asserts only norm-module
internals (f32 by design — the autocast fp32 norm policy) are f32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.config import Config
from openvis_tpu.train import build_model


def _amp_cast(params):
    # mirror train.make_loss_fn's AMP param cast (norm params stay f32)
    def cast(path, x):
        if x.dtype != jnp.float32:
            return x
        comps = [str(getattr(k, "key", k)).lower() for k in path]
        if any("norm" in c or c.startswith("ln") for c in comps):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def _flat_intermediates(inter):
    flat = {}

    def walk(d, pref=""):
        for k, v in d.items():
            name = f"{pref}/{k}"
            if isinstance(v, dict):
                walk(v, name)
            else:
                for i, a in enumerate(v if isinstance(v, tuple) else (v,)):
                    if hasattr(a, "dtype"):
                        flat[f"{name}[{i}]"] = a.dtype

    walk(inter["intermediates"])
    return flat


@pytest.mark.parametrize("backbone", ["resnet", "swin", "san"])
def test_amp_forward_stays_bf16(backbone):
    K, D = 7, 512
    cfg = Config()
    mc = dataclasses.replace(cfg.model, num_classes=K)
    if backbone == "san":
        # flagship OV arch: side adapter + split CLIP tower path
        mc = dataclasses.replace(
            mc,
            meta_architecture="SANOnline",
            transformer_decoder=dataclasses.replace(
                mc.transformer_decoder, name="side_adapter_frame"
            ),
        )
    if backbone == "swin":
        mc = dataclasses.replace(
            mc,
            backbone=dataclasses.replace(
                mc.backbone, name="swin", swin_depths=(1, 1, 2, 1),
                swin_num_heads=(2, 4, 8, 16), swin_embed_dim=32,
            ),
        )
    cfg = dataclasses.replace(cfg, model=mc)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    tt, th, tw = 2, 64, 96
    pix = jnp.asarray(rng.randn(tt, th, tw, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), pix, tt, text)["params"]
    ap = _amp_cast(params)

    out, inter = model.apply(
        {"params": ap}, pix.astype(jnp.bfloat16), tt,
        text.astype(jnp.bfloat16), capture_intermediates=True,
    )
    flat = _flat_intermediates(inter)
    # every non-norm intermediate must be bf16 (norm internals are f32 by
    # the autocast fp32-norm policy; amp_norm casts back OUTSIDE the module)
    offenders = {
        k: str(dt)
        for k, dt in flat.items()
        if dt == jnp.float32
        and "norm" not in k.lower()
        and "/ln" not in k.lower()  # CLIP LayerNormF32 wrappers (ln_pre, ...)
    }
    assert not offenders, f"f32 promotion leaked: {offenders}"
    # the mask stack itself must be bf16 (the criterion scan relies on it)
    assert out["pred_masks_all"].dtype == jnp.bfloat16
