"""Shape/behavior tests for the masked transformer decoders."""

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.models.transformer_decoder import (
    MaskedTransformerDecoder,
    attn_bias_from_mask_logits,
)

B, T, Q, C = 1, 2, 8, 64
HM, WM = 16, 24  # mask-feature (1/4) grid
SIZES = [(2, 3), (4, 6), (8, 12)]  # 1/32, 1/16, 1/8


def _features(bt):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(bt, h, w, C).astype(np.float32)) for h, w in SIZES]


def test_frame_decoder_shapes():
    dec = MaskedTransformerDecoder(
        mode="frame", head="class", hidden_dim=C, num_queries=Q, nheads=4,
        dim_feedforward=2 * C, dec_layers=3, num_classes=5, in_channels=C,
        mask_dim=C,
    )
    mf = jnp.asarray(np.random.RandomState(1).randn(B * T, HM, WM, C).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), _features(B * T), mf, T)
    out = dec.apply(params, _features(B * T), mf, T)
    assert out["pred_masks_all"].shape == (4, B, Q, T, HM, WM)
    assert out["pred_logits_all"].shape == (4, B, T, Q, 6)
    assert out["pred_embeds"].shape == (B, T, Q, C)
    assert out["pred_masks"].shape == (B, Q, T, HM, WM)


def test_video_decoder_shapes():
    dec = MaskedTransformerDecoder(
        mode="video", head="embedding", hidden_dim=C, num_queries=Q, nheads=4,
        dim_feedforward=2 * C, dec_layers=3, clip_dim=32, in_channels=C,
        mask_dim=C,
    )
    mf = jnp.asarray(np.random.RandomState(1).randn(B, T, HM, WM, C).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), _features(B * T), mf, T)
    out = dec.apply(params, _features(B * T), mf, T)
    assert out["pred_masks_all"].shape == (4, B, Q, T, HM, WM)
    assert out["pred_logits_all"].shape == (4, B, Q, 32)


def test_attn_bias_all_masked_fixup():
    # one query fully masked-off -> must become fully allowed (bias 0)
    logits = jnp.full((1, 2, 8, 8), -5.0)
    logits = logits.at[0, 1, 2:5, 2:5].set(5.0)
    bias = attn_bias_from_mask_logits(logits, (4, 4))
    b = np.asarray(bias)[0, 0]  # (Q, 16)
    assert (b[0] == 0).all(), "fully-masked query must attend everywhere"
    assert (b[1] == 0).any() and (b[1] != 0).any()


def test_proposal_head():
    dec = MaskedTransformerDecoder(
        mode="frame", head="proposal", hidden_dim=C, num_queries=Q, nheads=4,
        dim_feedforward=2 * C, dec_layers=2, in_channels=C, mask_dim=C,
    )
    mf = jnp.asarray(np.random.RandomState(1).randn(B * T, HM, WM, C).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), _features(B * T), mf, T)
    out = dec.apply(params, _features(B * T), mf, T)
    assert out["pred_logits_all"].shape == (3, B, T, Q, 2)


def test_zero_shot_head():
    """ZeroShot decoder head (zero_shot_mask2former_transformer_decoder.py:
    246-266): logits = [decoder embedding (hidden) | objectness (2)]."""
    dec = MaskedTransformerDecoder(
        mode="frame", head="zero_shot", hidden_dim=C, num_queries=Q, nheads=4,
        dim_feedforward=2 * C, dec_layers=2, in_channels=C, mask_dim=C,
    )
    mf = jnp.asarray(np.random.RandomState(1).randn(B * T, HM, WM, C).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), _features(B * T), mf, T)
    out = dec.apply(params, _features(B * T), mf, T)
    assert out["pred_logits_all"].shape == (3, B, T, Q, C + 2)
    # embed part == pred_embeds (both are decoder_norm outputs)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"][..., :C]),
        np.asarray(out["pred_embeds"]), rtol=1e-5, atol=1e-5,
    )


def test_transformer_encoder_pixel_decoder():
    """TransformerEncoderPixelDecoder path (pixel_decoder/fpn.py + the DETR
    encoder from transformer.py:19): res5 runs through the encoder before
    the FPN; output contract identical to the FPN path."""
    from openvis_tpu.models.pixel_decoder import BasePixelDecoder

    rng = np.random.RandomState(0)
    feats = {
        "res2": jnp.asarray(rng.randn(2, 32, 48, 32).astype(np.float32)),
        "res3": jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(2, 8, 12, 128).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(2, 4, 6, 256).astype(np.float32)),
    }
    pd = BasePixelDecoder(conv_dim=C, mask_dim=C, transformer_enc_layers=2,
                          nheads=4, dim_feedforward=2 * C)
    params = pd.init(jax.random.PRNGKey(0), feats)
    mask_features, top, ms = pd.apply(params, feats)
    assert mask_features.shape == (2, 32, 48, C)
    assert top.shape == (2, 4, 6, C)
    assert [m.shape[1:3] for m in ms] == [(4, 6), (8, 12), (16, 24)]
    assert "enc_attn0" in params["params"]
