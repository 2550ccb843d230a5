"""Sine position encodings (1D / 2D / 3D).

Functional rebuild of the reference's ``PositionEmbeddingSine{1D,2D,3D}``
(``openvis/modeling/transformer_decoder/position_encoding.py:11,61,118``):
DETR-style sine/cosine features with ``normalize=True``, ``scale=2π``,
temperature 10000.  The 3D variant adds a temporal term over clip frames.

We compute on index grids (not padding masks): on TPU every clip in a batch
shares one padded canvas and validity is handled by attention masks, so the
cumsum-over-mask trick of the reference reduces to a plain normalized iota.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _sine_embed(pos: jnp.ndarray, num_pos_feats: int, temperature: float = 10000.0):
    """pos: (...,) normalized*scale positions -> (..., num_pos_feats)."""
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    p = pos[..., None] / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
        *pos.shape, num_pos_feats
    )


def position_encoding_1d(length: int, num_pos_feats: int = 256) -> jnp.ndarray:
    """(length, num_pos_feats)."""
    scale = 2 * math.pi
    x = (jnp.arange(length, dtype=jnp.float32) + 1.0) / (length + 1e-6) * scale
    return _sine_embed(x, num_pos_feats)


def position_encoding_2d(h: int, w: int, num_pos_feats: int = 128) -> jnp.ndarray:
    """(h, w, 2*num_pos_feats) — concat(y_embed, x_embed) like DETR."""
    scale = 2 * math.pi
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + 1e-6) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + 1e-6) * scale
    pe_y = _sine_embed(y, num_pos_feats)  # (h, F)
    pe_x = _sine_embed(x, num_pos_feats)  # (w, F)
    pe_y = jnp.broadcast_to(pe_y[:, None, :], (h, w, num_pos_feats))
    pe_x = jnp.broadcast_to(pe_x[None, :, :], (h, w, num_pos_feats))
    return jnp.concatenate([pe_y, pe_x], axis=-1)


def position_encoding_3d(t: int, h: int, w: int, hidden_dim: int = 256) -> jnp.ndarray:
    """(t, h, w, hidden_dim).  Matches the reference's 3D PE: spatial
    concat(pos_y, pos_x) of hidden_dim//2 features each, with a temporal
    pos_z of hidden_dim features **added** on top
    (``position_encoding.py:118-164``)."""
    f = hidden_dim // 2
    scale = 2 * math.pi
    z = (jnp.arange(t, dtype=jnp.float32) + 1.0) / (t + 1e-6) * scale
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + 1e-6) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + 1e-6) * scale
    pe_z = _sine_embed(z, hidden_dim)  # (t, hidden)
    pe_y = jnp.broadcast_to(_sine_embed(y, f)[None, :, None, :], (t, h, w, f))
    pe_x = jnp.broadcast_to(_sine_embed(x, f)[None, None, :, :], (t, h, w, f))
    pe = jnp.concatenate([pe_y, pe_x], axis=-1)
    return pe + pe_z[:, None, None, :]


def np_position_encoding_2d(h: int, w: int, num_pos_feats: int = 128) -> np.ndarray:
    return np.asarray(position_encoding_2d(h, w, num_pos_feats))
