"""Checkpoint save/restore (orbax) + pretrained-init loading.

Replaces the reference's Detectron2 ``DetectionCheckpointer.resume_or_load``
flow (``train_net.py:290,299``; periodic saves every
``SOLVER.CHECKPOINT_PERIOD`` iters): orbax checkpoints of the full
``TrainState`` with keep-latest retention, plus partial initialization from
converted pretrained trees (Mask2Former segmenter, CLIP towers, or a SAN
stage-1 checkpoint for BriVIS — the reference's two-stage surgery,
``brivis_R50_bs16_6000st.yaml:3``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _mgr(directory: str, keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any, keep: int = 5):
    import orbax.checkpoint as ocp

    mgr = _mgr(directory, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    return mgr.latest_step()


def restore_checkpoint(directory: str, state_template: Any) -> Any:
    """Restore the latest checkpoint into the template's structure."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(state_template))


def load_params_from_checkpoint(directory: str) -> Optional[Any]:
    """Load the ``params`` tree of the latest checkpoint as raw arrays.

    Cross-architecture checkpoint surgery: BriVIS stage 2 initializes its
    ``segmenter`` + ``clip_adapter`` subtrees from a SAN stage-1 checkpoint
    (the reference points ``MODEL.WEIGHTS`` at the stage-1 ``model_final.pth``,
    ``brivis_R50_bs16_6000st.yaml:3`` + ``train_net.py:290``, and the d2
    checkpointer partial-loads matching keys).  The caller grafts the
    returned tree onto a fresh init via :func:`merge_pretrained`; subtrees
    absent from the target init (e.g. the checkpoint's own resampler when
    grafting SAN→BriVIS there is none) merge harmlessly.

    Returns ``None`` if the directory holds no checkpoint.
    """
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        return None
    tree = mgr.restore(step, args=ocp.args.StandardRestore())
    if not isinstance(tree, dict) or "params" not in tree:
        raise ValueError(
            f"checkpoint at {directory} step {step} has no 'params' tree"
        )
    return tree["params"]


def merge_pretrained(params: Any, pretrained: Any, subtree: str = "") -> Any:
    """Graft a converted pretrained tree onto (a subtree of) init params.

    Keys present in ``pretrained`` override; everything else keeps its init
    (the d2 checkpointer's tolerant partial-load semantics).
    """

    def merge(dst, src):
        if not isinstance(src, dict):
            return src
        out = dict(dst)
        for k, v in src.items():
            if k in out:
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    if not subtree:
        return merge(params, pretrained)
    out = dict(params)
    out[subtree] = merge(params.get(subtree, {}), pretrained)
    return out
