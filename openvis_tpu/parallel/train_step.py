"""Optimizer + sharded train step.

Rebuild of the reference trainer's optimizer factory and step
(``train_net.py:131-203`` + d2 ``SimpleTrainer.run_step``):

  * AdamW, base lr with **backbone x0.1** multiplier
    (``SOLVER.BACKBONE_MULTIPLIER``, train_net.py:160-163);
  * weight decay 0.05, but 0 for norm scales/biases, all biases, and
    embedding tables (``train_net.py:150-176``);
  * frozen-BN affines (our FrozenAffine params) get **zero** updates —
    equivalent to d2's FrozenBatchNorm2d having no trainable params;
  * full-model grad-norm clip 0.01 (``train_net.py:177-191``);
  * step LR schedule (gamma 0.1 at SOLVER.STEPS) with linear warmup;
  * grads averaged across the ``data`` mesh axis by XLA (DDP equivalent).

The train step is a single jitted function over global (mesh-sharded)
arrays; bf16 compute happens inside the model (``solver.amp``).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from openvis_tpu.config import Config


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _backbone_stage(segment: str) -> Optional[int]:
    """d2 stage index of a backbone param-tree segment: stem/patch-embed = 1,
    ``res{k}`` = k (ResNet), ``stage{i}``/``downsample{i}``/``out_norm{i}`` =
    i + 2 (Swin).  None for unrecognized segments (never frozen)."""
    if segment.startswith(("stem", "patch_embed", "patch_norm", "ape")):
        return 1
    m = re.match(r"res(\d)_", segment)
    if m:
        return int(m.group(1))
    m = re.match(r"(?:stage|downsample|out_norm)(\d+)", segment)
    if m:
        return int(m.group(1)) + 2
    return None


def label_params(params, freeze_prefixes=(), freeze_at: int = 0) -> Any:
    """Label each param: 'frozen' | 'backbone' | 'backbone_nodecay' |
    'backbone_embed' | 'main' | 'nodecay' | 'embed'.  Embedding-type params
    (query/level/positional embeddings, class tokens, rel-pos tables) form
    their own group so ``SOLVER.WEIGHT_DECAY_EMBED`` applies to them and
    ``WEIGHT_DECAY_NORM`` to norms/biases, matching the reference's
    per-module overrides (``train_net.py:150-176``).
    ``freeze_prefixes``: top-level subtree names whose
    params get zero updates (BriVIS stage 2 freezes segmenter +
    clip_adapter, brivis.py:36-41).  ``freeze_at``: d2 ``BACKBONE.FREEZE_AT``
    — zero updates for the stem (1) and stages up to ``freeze_at``
    (d2 ``ResNet.freeze``; the reference trains with FREEZE_AT 0 but the
    knob is part of the config contract)."""

    def label(path, x):
        p = _path_str(path).lower()
        for pref in freeze_prefixes:
            if p.startswith(pref.lower()):
                return "frozen"
        # SAN-family CLIP tower: the reference freezes the whole clip_model
        # (side_adapter.py:101 freeze_params) while attn_projs / bg_embed /
        # logit_scale stay trainable.  MasQCLIP's tower lives under
        # clip_adapter/resblock* (graph-structural freeze), untouched here.
        if "clip_adapter/visual/" in f"/{p}/":
            return "frozen"
        if freeze_at > 0 and "/backbone/" in f"/{p}/":
            seg = p.split("backbone/", 1)[1].split("/", 1)[0]
            stage = _backbone_stage(seg)
            if stage is not None and stage <= freeze_at:
                return "frozen"
        frozen_affine = ("norm" in p and "scale" in p.split("/")[-1]) or (
            "norm" in p and p.split("/")[-1] == "bias"
        )
        in_backbone = "/backbone/" in f"/{p}/"
        # FrozenAffine params live under .../norm*/{scale,bias} in the backbone
        if in_backbone and frozen_affine:
            return "frozen"
        embed = (
            "embedding" in p
            or "embed" in p.split("/")[-1]
            or p.split("/")[-1] in ("query_feat", "query_embed", "level_embed",
                                    "positional_embedding", "class_embedding",
                                    "logit_scale", "non_object_embedding",
                                    "relative_position_bias_table")
        )
        nodecay = (
            p.endswith("bias")
            or "scale" in p.split("/")[-1]
            or "/ln" in p
            or "layernorm" in p
        )
        if in_backbone:
            if embed:
                return "backbone_embed"
            return "backbone_nodecay" if nodecay else "backbone"
        if embed:
            return "embed"
        return "nodecay" if nodecay else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def config_labels(cfg: Config, params) -> Any:
    """Param labels for the config's freeze settings — shared by
    :func:`make_optimizer` (zero updates) and ``train.make_loss_fn``
    (``stop_gradient``, the ``requires_grad=False`` analog)."""
    freeze_prefixes = (
        ("segmenter", "clip_adapter") if cfg.model.freeze_segmenter else ()
    )
    return label_params(
        params, freeze_prefixes, freeze_at=cfg.model.backbone.freeze_at
    )


def stop_frozen_gradients(cfg: Config, params):
    """``lax.stop_gradient`` on every 'frozen'-labeled param — the torch
    ``requires_grad=False`` analog (reference ``freeze_params``,
    ``side_adapter.py:18-23``; BriVIS stage-2 ``brivis.py:36-41``).  Two
    effects the optimizer-level ``set_to_zero`` alone cannot give:

      * the frozen subtrees' backward chains (param cotangent matmuls, and
        for purely-frozen ancestries like SAN's CLIP front encode the whole
        activation backward) dead-code-eliminate out of the train step;
      * their grads are EXACT zeros, so the global grad-clip norm matches
        torch's ``clip_grad_norm_`` over requires-grad params — with
        computed-then-discarded grads in the norm, clipping (0.01 in every
        recipe) rescaled the real gradients by the wrong factor.
    """
    labels = config_labels(cfg, params)
    return jax.tree.map(
        lambda p, l: jax.lax.stop_gradient(p) if l == "frozen" else p,
        params, labels,
    )


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    s = cfg.solver
    boundaries = {int(b): s.gamma for b in s.steps}
    base = optax.piecewise_constant_schedule(s.base_lr, boundaries)
    if s.warmup_iters > 0 and s.warmup_factor < 1.0:
        warm = optax.linear_schedule(
            s.base_lr * s.warmup_factor, s.base_lr, s.warmup_iters
        )
        return optax.join_schedules([warm, base], [s.warmup_iters])
    return base


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    s = cfg.solver
    lr = make_lr_schedule(cfg)

    if s.optimizer.lower() not in ("adamw", "sgd"):
        raise ValueError(
            f"solver.optimizer={s.optimizer!r}: expected 'adamw' or 'sgd' "
            "(reference build_optimizer, d2 SOLVER.OPTIMIZER)"
        )

    def group(mult: float, wd: float):
        scale = optax.scale_by_learning_rate(lambda step: lr(step) * mult)
        if s.optimizer.lower() == "sgd":
            # d2 SGD: L2 decay folded into the gradient, momentum 0.9
            return optax.chain(
                optax.add_decayed_weights(wd), optax.trace(decay=0.9), scale
            )
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.add_decayed_weights(wd),
            scale,
        )

    labels = config_labels(cfg, params)
    tx = optax.multi_transform(
        {
            "main": group(1.0, s.weight_decay),
            "nodecay": group(1.0, s.weight_decay_norm),
            "embed": group(1.0, s.weight_decay_embed),
            "backbone": group(s.backbone_multiplier, s.weight_decay),
            "backbone_nodecay": group(s.backbone_multiplier, s.weight_decay_norm),
            "backbone_embed": group(s.backbone_multiplier, s.weight_decay_embed),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if s.clip_gradients:
        tx = optax.chain(optax.clip_by_global_norm(s.clip_value), tx)
    return tx


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_train_step(
    loss_fn: Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]],
    tx: optax.GradientTransformation,
):
    """loss_fn(params, batch, rng) -> (total_loss, metrics)."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step
