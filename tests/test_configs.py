"""Every shipped recipe config parses and builds its model module.

Guards the recipe surface mirrored from ``/root/reference/configs/**``: a
config whose decoder/adapter/backbone names fell out of sync with the
registries in ``openvis_tpu/models/segmenter.py`` or ``train.build_model``
would only fail at train launch otherwise.  Module construction is
parameter-free (flax lazy init), so this stays cheap even for Swin/ViT-L
recipes.
"""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True)
)


def _rel(p):
    return os.path.relpath(p, REPO)


@pytest.mark.parametrize("path", CONFIGS, ids=_rel)
def test_config_parses_and_builds(path):
    from openvis_tpu.config import load_config
    from openvis_tpu.train import build_model, is_online

    cfg = load_config(path)
    if os.path.basename(path) == "Base.yaml":
        return  # bases are inherited, not launched directly
    model = build_model(cfg)
    assert model is not None
    # decoder-name registry resolution (raises on unknown names)
    is_online(cfg)


def test_recipe_inventory_matches_reference():
    """Each reference recipe yaml has a same-named repo counterpart
    (reference: /root/reference/configs; eval_* extras are repo-only)."""
    ref_root = "/root/reference/configs"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree unavailable")
    ref = {
        os.path.relpath(p, ref_root)
        for p in glob.glob(os.path.join(ref_root, "**", "*.yaml"), recursive=True)
    }
    mine = {
        os.path.relpath(p, os.path.join(REPO, "configs"))
        for p in glob.glob(
            os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True
        )
    }
    missing = sorted(ref - mine)
    assert not missing, f"reference recipes without a repo counterpart: {missing}"
