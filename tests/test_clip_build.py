"""Rank-0 CLIP checkpoint fetch + convert (``models/clip/build.py``).

Rebuilds the reference's download-then-sync loaders
(``/root/reference/openvis/modeling/clip_adapter/utils.py:69-95``) — no
network in the container, so fetching is exercised via ``file://`` URLs.
"""

import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openvis_tpu.models.clip.build import (  # noqa: E402
    _MODELS,
    build_clip_params,
    fetch_clip_checkpoint,
)


def _blob(tmp_path, name, data: bytes):
    os.makedirs(tmp_path, exist_ok=True)
    p = tmp_path / name
    p.write_bytes(data)
    return p


def test_local_path_passthrough(tmp_path):
    p = _blob(tmp_path, "x.pt", b"abc")
    assert fetch_clip_checkpoint(str(p)) == str(p)


def test_unknown_name_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown CLIP model"):
        fetch_clip_checkpoint("ViT-Z/99", cache_dir=str(tmp_path))


def test_model_table_has_reference_zoo():
    # the names the reference recipes use (ViT-B/16 default, ViT-L/14@336px
    # for Swin configs, RN50/RN101 mask-adapted towers)
    for name in ("RN50", "RN101", "ViT-B/16", "ViT-L/14@336px"):
        assert name in _MODELS
        sha = _MODELS[name].split("/")[-2]
        assert len(sha) == 64 and set(sha) <= set("0123456789abcdef")


def test_file_url_fetch_and_cache(tmp_path):
    src = _blob(tmp_path / "srv", "weights.pt", b"payload-v1")
    os.makedirs(tmp_path / "srv", exist_ok=True)
    cache = tmp_path / "cache"
    url = src.as_uri()
    got = fetch_clip_checkpoint(url, cache_dir=str(cache))
    assert got == str(cache / "weights.pt")
    assert open(got, "rb").read() == b"payload-v1"
    # cached: mutating the source must NOT change what we get back
    src.write_bytes(b"payload-v2")
    got2 = fetch_clip_checkpoint(url, cache_dir=str(cache))
    assert open(got2, "rb").read() == b"payload-v1"


def test_sha_verified_fetch(tmp_path):
    data = b"checked-bytes"
    sha = hashlib.sha256(data).hexdigest()
    src = _blob(tmp_path / sha, "RN50.pt", data)
    got = fetch_clip_checkpoint(src.as_uri(), cache_dir=str(tmp_path / "c1"))
    assert open(got, "rb").read() == data

    # wrong digest in the URL path -> refused, nothing cached
    bad = _blob(tmp_path / ("0" * 64), "RN50.pt", data)
    with pytest.raises(IOError, match="checksum mismatch"):
        fetch_clip_checkpoint(bad.as_uri(), cache_dir=str(tmp_path / "c2"))
    assert not os.path.exists(tmp_path / "c2" / "RN50.pt")


def test_build_clip_params_msgpack_passthrough(tmp_path):
    from tools.convert_weights import save_msgpack

    tree = {"visual": {"w": np.arange(4, dtype=np.float32)}}
    p = tmp_path / "clip.msgpack"
    save_msgpack(tree, str(p))
    out = build_clip_params(str(p))
    np.testing.assert_array_equal(out["visual"]["w"], tree["visual"]["w"])
