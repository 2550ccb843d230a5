import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.models.backbone.resnet import ResNet, feature_channels
from openvis_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from openvis_tpu.models.position_encoding import position_encoding_2d, position_encoding_3d


def test_resnet50_feature_pyramid_shapes():
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    chans = feature_channels(50)
    for name, stride in [("res2", 4), ("res3", 8), ("res4", 16), ("res5", 32)]:
        assert feats[name].shape == (1, 64 // stride, 96 // stride, chans[name]), name


def test_pixel_decoder_shapes():
    feats = {
        "res2": jnp.zeros((1, 16, 24, 256)),
        "res3": jnp.zeros((1, 8, 12, 512)),
        "res4": jnp.zeros((1, 4, 6, 1024)),
        "res5": jnp.zeros((1, 2, 3, 2048)),
    }
    dec = MSDeformAttnPixelDecoder(enc_layers=2)
    params = dec.init(jax.random.PRNGKey(0), feats)
    mask_features, enc_feat, ms = dec.apply(params, feats)
    assert mask_features.shape == (1, 16, 24, 256)
    assert enc_feat.shape == (1, 2, 3, 256)
    assert [m.shape for m in ms] == [(1, 2, 3, 256), (1, 4, 6, 256), (1, 8, 12, 256)]


def test_position_encodings_match_torch_semantics():
    # spot-check the DETR sine formula at a few positions
    pe = np.asarray(position_encoding_2d(4, 6, 128))
    assert pe.shape == (4, 6, 256)
    # y-feature at (y=0): sin(((0+1)/4*2pi)/10000^0) for feature 0
    expected = np.sin((1 / (4 + 1e-6)) * 2 * np.pi)
    np.testing.assert_allclose(pe[0, 0, 0], expected, rtol=1e-5)
    pe3 = position_encoding_3d(2, 4, 6, 256)
    assert pe3.shape == (2, 4, 6, 256)


def test_fpn_pixel_decoder():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from openvis_tpu.config import Config
    from openvis_tpu.models.segmenter import Segmenter

    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=3,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, name="fpn", conv_dim=64, mask_dim=64,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, name="frame", hidden_dim=64,
            num_queries=8, nheads=4, dim_feedforward=128, dec_layers=2,
            mask_dim=64,
        ),
    )
    seg = Segmenter(m)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    params = seg.init(jax.random.PRNGKey(0), frames, 2)["params"]
    out = seg.apply({"params": params}, frames, 2)
    assert out["pred_masks"].shape == (1, 8, 2, 16, 24)
