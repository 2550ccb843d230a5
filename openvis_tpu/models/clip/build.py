"""Multi-process CLIP checkpoint fetching + conversion.

Rebuilds the reference's rank-0-download-then-sync loaders
(``/root/reference/openvis/modeling/clip_adapter/utils.py:69-95`` —
``build_clip_model`` / ``build_mask_adapted_clip_model``: the local-rank-0
process downloads the OpenAI checkpoint, ``comm.synchronize()`` barriers,
then every rank loads from the shared cache).

TPU-native shape: ``jax.process_index() == 0`` fetches the file, a
``multihost_utils.sync_global_devices`` barrier replaces the
``torch.distributed`` barrier (it is a no-op single-process), then ALL
processes read the cached file and convert it with
``tools/convert_weights.convert_clip`` into the flax param pytree the
towers consume.  No torch hub / NCCL involvement — the only cross-process
primitive is the XLA barrier, and the cache directory is assumed shared
(or per-host, in which case every local rank 0 fetches — matching the
reference's per-node behavior).

The model-name → URL table mirrors the public constants of openai/CLIP
(same category as ``prompts.py``: public data, not code).  Each OpenAI URL
embeds the artifact's SHA-256 as a path component; downloads are verified
against it before the cache is committed.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile
import urllib.request

# Public OpenAI CLIP release URLs (openai/CLIP clip/clip.py `_MODELS`).
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}

_SHA_RE = re.compile(r"/([0-9a-f]{64})/[^/]+$")


def default_cache_dir() -> str:
    return os.environ.get(
        "OPENVIS_TPU_CACHE", os.path.expanduser("~/.cache/openvis_tpu/clip")
    )


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _fetch(url: str, dst: str, expected_sha: str | None) -> None:
    """Download ``url`` to ``dst`` atomically, verifying SHA-256 if known."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst), suffix=".part")
    os.close(fd)
    try:
        urllib.request.urlretrieve(url, tmp)
        if expected_sha is not None:
            got = _sha256(tmp)
            if got != expected_sha:
                raise IOError(
                    f"checksum mismatch for {url}: expected {expected_sha}, "
                    f"got {got}"
                )
        os.replace(tmp, dst)  # atomic commit: readers never see a partial file
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def fetch_clip_checkpoint(name_or_path: str, cache_dir: str | None = None) -> str:
    """Resolve a CLIP model name / URL / local path to a local file.

    Reference parity: ``clip_adapter/utils.py:69-81`` (``build_clip_model``
    resolves the model zoo name, local-rank-0 downloads, all ranks barrier,
    then load).  Local paths pass through untouched; names resolve via
    ``_MODELS``; ``http(s)://`` and ``file://`` URLs fetch directly.  Only
    process 0 downloads; every process returns after the global barrier
    with the cached path.
    """
    if os.path.exists(name_or_path):
        return name_or_path
    url = _MODELS.get(name_or_path, name_or_path)
    if "://" not in url:
        raise ValueError(
            f"unknown CLIP model {name_or_path!r}: not a local file, not one "
            f"of {sorted(_MODELS)}, and not a URL"
        )
    cache_dir = cache_dir or default_cache_dir()
    dst = os.path.join(cache_dir, os.path.basename(url))
    import jax
    from jax.experimental import multihost_utils

    m = _SHA_RE.search(url)
    if not os.path.exists(dst) and jax.process_index() == 0:
        _fetch(url, dst, m.group(1) if m else None)
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(f"clip_fetch:{os.path.basename(url)}")
    if not os.path.exists(dst):
        # per-host (non-shared) cache: each JAX process is its host's local
        # rank 0, so fetch locally — the reference downloads on every node's
        # local rank 0 (clip_adapter/utils.py get_local_rank()==0)
        _fetch(url, dst, m.group(1) if m else None)
    return dst


def build_clip_params(name_or_path: str, cache_dir: str | None = None):
    """Fetch + convert a CLIP checkpoint into the flax param pytree.

    Accepts an OpenAI model name ("ViT-B/16"), a URL, a local ``.pt`` torch
    checkpoint, or an already-converted ``.msgpack`` pytree; returns the
    tree ``models/clip/model.py``'s towers consume (same structure
    ``tools/convert_weights.py clip`` writes).
    """
    path = fetch_clip_checkpoint(name_or_path, cache_dir)
    from tools.convert_weights import convert_clip, load_msgpack, load_torch_state

    if path.endswith(".msgpack"):
        return load_msgpack(path)
    return convert_clip(load_torch_state(path))
