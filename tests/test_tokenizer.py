"""BPE tokenizer: roundtrip + parity vs HuggingFace CLIPTokenizer built
from the same merge table (independent implementation of the same spec)."""

import json
import os

import numpy as np
import pytest

from openvis_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize

BPE_PATH = (
    "/root/reference/third_parties/mask_adapted_clip/mask_adapted_clip/"
    "bpe_simple_vocab_16e6.txt.gz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(BPE_PATH), reason="BPE vocab asset not available"
)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer(BPE_PATH)


def test_vocab_size(tok):
    assert len(tok.encoder) == 49408


def test_roundtrip(tok):
    # decode re-spaces around word boundaries (</w> -> " "), so compare on
    # whitespace-insensitive form like the original tokenizer's decode
    for text in ("person", "giant panda", "a photo of a sedan.",
                 "hello world", "ape", "parking meter"):
        ids = tok.encode(text)
        assert tok.decode(ids).replace(" ", "") == text.lower().replace(" ", "")


def test_tokenize_array(tok):
    arr = tokenize(tok, ["person", "a photo of a dog."])
    assert arr.shape == (2, 77)
    assert arr[0, 0] == tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert (arr == eot).sum() == 2
    # EOT must be the max id in each row (CLIP pools at argmax)
    assert (arr.max(axis=1) == eot).all()


def test_parity_vs_hf_clip_tokenizer(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    import gzip

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with gzip.open(BPE_PATH, "rt", encoding="utf-8") as f:
        merges = f.read().split("\n")[1 : 49152 - 256 - 2 + 1]
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges))
    hf = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))
    for text in ("person", "giant panda", "a photo of a sedan.",
                 "flying disc", "zebra crossing at night",
                 "There is a small airplane in the scene."):
        ours = tok.encode(text)
        ref = hf(text)["input_ids"][1:-1]  # strip bos/eos
        assert ours == ref, (text, ours, ref)
