"""Prompt-ensembled text-embedding bank (host-side cache + device encode).

Equivalent of ``ClipAdapter.encode_text``'s per-class cache
(``openvis/modeling/clip_adapter/adapter.py:121-138``): each class name is
encoded once under every template, per-template embeddings are L2-normalized,
averaged, and re-normalized.  The resulting (K, D) matrix is a frozen
constant fed into the jitted step — no text encoding inside the train loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.models.clip.model import CLIPTextEncoder
from openvis_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize


def normalize(x, axis=-1, eps=0.0):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / (n + eps)


class TextEmbeddingBank:
    def __init__(
        self,
        text_encoder: CLIPTextEncoder,
        text_params,
        tokenizer: SimpleTokenizer,
        templates: Sequence[str],
        batch_size: int = 256,
    ):
        self.encoder = text_encoder
        self.params = text_params
        self.tokenizer = tokenizer
        self.templates = list(templates)
        self.batch_size = batch_size
        self.cache: Dict[str, np.ndarray] = {}
        self._encode = jax.jit(
            lambda p, toks: self.encoder.apply({"params": p}, toks)
        )

    def _encode_tokens(self, tokens: np.ndarray) -> np.ndarray:
        outs = []
        bs = self.batch_size
        # pad the final chunk to a full batch: one trace for any class count
        for i in range(0, len(tokens), bs):
            chunk = tokens[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)])
                chunk[len(tokens) - i :, 1] = 1  # dummy EOT-ish token, discarded
            out = np.asarray(self._encode(self.params, jnp.asarray(chunk)))
            outs.append(out[: len(tokens) - i] if pad else out)
        return np.concatenate(outs, axis=0)

    def encode(self, class_names: Sequence[str]) -> np.ndarray:
        """-> (K, D) float32, prompt-ensembled + normalized."""
        new = [n for n in class_names if n not in self.cache]
        if new:
            per_template = []
            for tmpl in self.templates:
                toks = tokenize(
                    self.tokenizer, [tmpl.format(n) for n in new]
                )
                emb = self._encode_tokens(toks)
                per_template.append(normalize(emb))
            emb = normalize(np.stack(per_template).mean(0))
            for i, n in enumerate(new):
                self.cache[n] = emb[i].astype(np.float32)
        return np.stack([self.cache[n] for n in class_names])

    def encode_padded(
        self, class_names: Sequence[str], pad_to: int
    ) -> np.ndarray:
        """(pad_to, D) with zero rows beyond K (zero rows give sim 0)."""
        emb = self.encode(class_names)
        k, d = emb.shape
        out = np.zeros((pad_to, d), np.float32)
        out[:k] = emb
        return out
