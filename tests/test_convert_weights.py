"""Weight converter: synthetic torch-layout state dicts must convert into
trees that exactly match the flax modules' init structure."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
from openvis_tpu.models.clip.model import CLIPTextEncoder, CLIPVisionTransformer
from openvis_tpu.models.segmenter import Segmenter
from tools.convert_weights import convert_clip, convert_mask2former


def _tiny_cfg():
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=7,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, conv_dim=64, mask_dim=64,
            transformer_enc_layers=2, dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, name="frame",
            hidden_dim=64, num_queries=8, nheads=4, dim_feedforward=128,
            dec_layers=2, mask_dim=64,
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _d2_state(rng, hidden=64, enc=2, dec=2, nheads=4, npoints=4, classes=7):
    """Synthetic d2 Mask2Former state dict (R50 backbone + heads), torch
    layouts."""
    d = {}

    def lin(name, i, o):
        d[f"{name}.weight"] = (0.05 * rng.randn(o, i)).astype(np.float32)
        d[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k, bias=True):
        d[f"{name}.weight"] = (0.05 * rng.randn(o, i, k, k)).astype(np.float32)
        if bias:
            d[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean"):
            d[f"{name}.{s}"] = rng.randn(c).astype(np.float32)
        d[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def norm(name, c):
        d[f"{name}.weight"] = rng.randn(c).astype(np.float32)
        d[f"{name}.bias"] = rng.randn(c).astype(np.float32)

    def mha(name, c):
        d[f"{name}.in_proj_weight"] = rng.randn(3 * c, c).astype(np.float32)
        d[f"{name}.in_proj_bias"] = rng.randn(3 * c).astype(np.float32)
        lin(f"{name}.out_proj", c, c)

    # resnet50 backbone
    conv("backbone.stem.conv1", 3, 64, 7, bias=False)
    bn("backbone.stem.conv1.norm", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for si, nb in enumerate(blocks):
        width = 64 * 2 ** si
        cout = width * 4
        for bi in range(nb):
            pre = f"backbone.res{si+2}.{bi}"
            conv(f"{pre}.conv1", cin if bi == 0 else cout, width, 1, bias=False)
            bn(f"{pre}.conv1.norm", width)
            conv(f"{pre}.conv2", width, width, 3, bias=False)
            bn(f"{pre}.conv2.norm", width)
            conv(f"{pre}.conv3", width, cout, 1, bias=False)
            bn(f"{pre}.conv3.norm", cout)
            if bi == 0:
                conv(f"{pre}.shortcut", cin, cout, 1, bias=False)
                bn(f"{pre}.shortcut.norm", cout)
        cin = cout

    # pixel decoder
    p = "sem_seg_head.pixel_decoder"
    d[f"{p}.level_embed"] = rng.randn(3, hidden).astype(np.float32)
    for i, c in enumerate((2048, 1024, 512)):
        conv(f"{p}.input_proj.{i}.0", c, hidden, 1)
        norm(f"{p}.input_proj.{i}.1", hidden)
    for i in range(enc):
        lp = f"{p}.transformer.encoder.layers.{i}"
        lin(f"{lp}.self_attn.sampling_offsets", hidden, nheads * 3 * npoints * 2)
        lin(f"{lp}.self_attn.attention_weights", hidden, nheads * 3 * npoints)
        lin(f"{lp}.self_attn.value_proj", hidden, hidden)
        lin(f"{lp}.self_attn.output_proj", hidden, hidden)
        norm(f"{lp}.norm1", hidden)
        lin(f"{lp}.linear1", hidden, 128)
        lin(f"{lp}.linear2", 128, hidden)
        norm(f"{lp}.norm2", hidden)
    conv(f"{p}.adapter_1", 256, hidden, 1, bias=False)
    norm(f"{p}.adapter_1.norm", hidden)
    conv(f"{p}.layer_1", hidden, hidden, 3, bias=False)
    norm(f"{p}.layer_1.norm", hidden)
    conv(f"{p}.mask_features", hidden, hidden, 1)

    # predictor
    p = "sem_seg_head.predictor"
    for n in ("query_feat", "query_embed"):
        d[f"{p}.{n}.weight"] = rng.randn(8, hidden).astype(np.float32)
    d[f"{p}.level_embed.weight"] = rng.randn(3, hidden).astype(np.float32)
    norm(f"{p}.decoder_norm", hidden)
    lin(f"{p}.class_embed", hidden, classes + 1)
    for i in range(3):
        lin(f"{p}.mask_embed.layers.{i}", hidden, hidden)
    for i in range(dec):
        mha(f"{p}.transformer_cross_attention_layers.{i}.multihead_attn", hidden)
        norm(f"{p}.transformer_cross_attention_layers.{i}.norm", hidden)
        mha(f"{p}.transformer_self_attention_layers.{i}.self_attn", hidden)
        norm(f"{p}.transformer_self_attention_layers.{i}.norm", hidden)
        lin(f"{p}.transformer_ffn_layers.{i}.linear1", hidden, 128)
        lin(f"{p}.transformer_ffn_layers.{i}.linear2", 128, hidden)
        norm(f"{p}.transformer_ffn_layers.{i}.norm", hidden)
    return d


def _tree_spec(t):
    return jax.tree.map(lambda x: jnp.shape(x), t)


def test_m2f_conversion_matches_init_tree():
    cfg = _tiny_cfg()
    seg = Segmenter(cfg.model)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    init = seg.init(jax.random.PRNGKey(0), frames, 2)["params"]

    state = _d2_state(np.random.RandomState(1))
    tree = convert_mask2former(state, depth=50, enc_layers=2, dec_layers=2)

    ref = _tree_spec(init)
    got = _tree_spec(tree)
    assert got == ref, (
        f"converted tree != init tree\nmissing: "
        f"{set(map(str, jax.tree_util.tree_leaves_with_path(ref))) - set(map(str, jax.tree_util.tree_leaves_with_path(got)))}"
    )
    # converted params must actually run
    out = seg.apply({"params": tree}, frames, 2)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_clip_conversion_runs():
    rng = np.random.RandomState(0)
    d = {}
    W, L, HEADS, EMB, VOCAB, CTX, PATCH, IMG = 64, 2, 4, 32, 128, 16, 8, 32
    g = IMG // PATCH

    def lin(name, i, o):
        d[f"{name}.weight"] = (0.05 * rng.randn(o, i)).astype(np.float32)
        d[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def norm(name, c):
        d[f"{name}.weight"] = rng.randn(c).astype(np.float32)
        d[f"{name}.bias"] = rng.randn(c).astype(np.float32)

    def block(pre, c):
        d[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * c, c).astype(np.float32)
        d[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * c).astype(np.float32)
        lin(f"{pre}.attn.out_proj", c, c)
        norm(f"{pre}.ln_1", c)
        norm(f"{pre}.ln_2", c)
        lin(f"{pre}.mlp.c_fc", c, 4 * c)
        lin(f"{pre}.mlp.c_proj", 4 * c, c)

    d["visual.conv1.weight"] = rng.randn(W, 3, PATCH, PATCH).astype(np.float32)
    d["visual.class_embedding"] = rng.randn(W).astype(np.float32)
    d["visual.positional_embedding"] = rng.randn(1 + g * g, W).astype(np.float32)
    norm("visual.ln_pre", W)
    norm("visual.ln_post", W)
    d["visual.proj"] = rng.randn(W, EMB).astype(np.float32)
    for i in range(L):
        block(f"visual.transformer.resblocks.{i}", W)
    d["token_embedding.weight"] = rng.randn(VOCAB, W).astype(np.float32)
    d["positional_embedding"] = rng.randn(CTX, W).astype(np.float32)
    norm("ln_final", W)
    d["text_projection"] = rng.randn(W, EMB).astype(np.float32)
    d["logit_scale"] = np.asarray([2.6], np.float32)
    for i in range(L):
        block(f"transformer.resblocks.{i}", W)

    tree = convert_clip(d)
    vis = CLIPVisionTransformer(patch_size=PATCH, width=W, layers=L,
                                heads=HEADS, embed_dim=EMB, image_size=IMG)
    img = jnp.asarray(rng.randn(2, IMG, IMG, 3).astype(np.float32))
    feats = vis.apply({"params": tree["visual"]}, img)
    assert feats.shape == (2, EMB)
    txt = CLIPTextEncoder(vocab_size=VOCAB, context_length=CTX, width=W,
                          heads=HEADS, layers=L, embed_dim=EMB)
    toks = jnp.asarray(rng.randint(0, VOCAB, (3, CTX)), jnp.int32)
    tf = txt.apply({"params": tree["text"]}, toks)
    assert tf.shape == (3, EMB)


def test_legacy_key_migration():
    """d2 v<2 checkpoints: bare sem_seg_head.* keys (no pixel_decoder.
    prefix) + static_query -> query_feat (the reference's
    _load_from_state_dict shims, mask_former_head.py:23-45 and
    video_mask2former_transformer_decoder.py:224-245)."""
    from tools.convert_weights import convert_mask2former, migrate_legacy_keys

    rng = np.random.RandomState(0)
    modern = _d2_state(rng)
    legacy = {}
    for k, v in modern.items():
        nk = k.replace("sem_seg_head.pixel_decoder.", "sem_seg_head.")
        nk = nk.replace("query_feat", "static_query")
        legacy[nk] = v
    assert any("static_query" in k for k in legacy)
    assert not any("pixel_decoder" in k for k in legacy)

    migrated = migrate_legacy_keys(legacy)
    assert set(migrated) == set(modern)

    a = convert_mask2former(modern, enc_layers=2, dec_layers=2)
    b = convert_mask2former(legacy, enc_layers=2, dec_layers=2)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        assert pa == pb
        np.testing.assert_array_equal(la, lb)


def test_timm_resnet_conversion_matches_init_tree():
    """timm resnet50 (IN21k) naming -> the same backbone tree the d2
    converter produces (OV2Seg's CustomResNet source, ov2seg.py:45-134)."""
    from tools.convert_weights import convert_resnet, convert_timm_resnet

    rng = np.random.RandomState(0)
    d = {}

    def conv(name, i, o, k):
        d[f"{name}.weight"] = (0.05 * rng.randn(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean"):
            d[f"{name}.{s}"] = rng.randn(c).astype(np.float32)
        d[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    cin = 64
    for si, nb in enumerate((3, 4, 6, 3)):
        width = 64 * 2 ** si
        cout = width * 4
        for bi in range(nb):
            pre = f"layer{si+1}.{bi}"
            conv(f"{pre}.conv1", cin if bi == 0 else cout, width, 1)
            bn(f"{pre}.bn1", width)
            conv(f"{pre}.conv2", width, width, 3)
            bn(f"{pre}.bn2", width)
            conv(f"{pre}.conv3", width, cout, 1)
            bn(f"{pre}.bn3", cout)
            if bi == 0:
                conv(f"{pre}.downsample.0", cin, cout, 1)
                bn(f"{pre}.downsample.1", cout)
        cin = cout

    tree = convert_timm_resnet(d)
    # same structure as the d2 converter over the synthetic d2 state
    d2_tree = convert_resnet(_d2_state(np.random.RandomState(1)))
    assert _tree_spec(tree) == _tree_spec(d2_tree)


def test_swin_conversion_round_trip():
    """convert_swin: a d2-layout Swin state built by INVERTING the conversion
    from a flax init must convert back to the identical tree (pins every
    transpose), and the converted params must run.  Matches the checkpoints
    the reference swin recipes load (swin/*.yaml:17)."""
    from openvis_tpu.models.backbone.swin import SWIN_SHAPES, SwinTransformer
    from tools.convert_weights import convert_swin

    shape = dict(SWIN_SHAPES["tiny"])
    model = SwinTransformer(**shape)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    init = model.init(jax.random.PRNGKey(0), x)["params"]

    d = {}

    def lin(name, p):
        d[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        if "bias" in p:
            d[f"{name}.bias"] = np.asarray(p["bias"])

    def norm(name, p):
        d[f"{name}.weight"] = np.asarray(p["scale"])
        d[f"{name}.bias"] = np.asarray(p["bias"])

    d["backbone.patch_embed.proj.weight"] = np.asarray(
        init["patch_embed"]["kernel"]
    ).transpose(3, 2, 0, 1)
    d["backbone.patch_embed.proj.bias"] = np.asarray(
        init["patch_embed"]["bias"]
    )
    norm("backbone.patch_embed.norm", init["patch_norm"])
    depths = shape["depths"]
    for si, nb in enumerate(depths):
        for bi in range(nb):
            blk = init[f"stage{si}_block{bi}"]
            pre = f"backbone.layers.{si}.blocks.{bi}"
            norm(f"{pre}.norm1", blk["norm1"])
            norm(f"{pre}.norm2", blk["norm2"])
            lin(f"{pre}.attn.qkv", blk["attn"]["qkv"])
            lin(f"{pre}.attn.proj", blk["attn"]["proj"])
            d[f"{pre}.attn.relative_position_bias_table"] = np.asarray(
                blk["attn"]["relative_position_bias_table"]
            )
            lin(f"{pre}.mlp.fc1", blk["mlp_fc1"])
            lin(f"{pre}.mlp.fc2", blk["mlp_fc2"])
        if si < len(depths) - 1:
            ds = init[f"downsample{si}"]
            norm(f"backbone.layers.{si}.downsample.norm", ds["norm"])
            d[f"backbone.layers.{si}.downsample.reduction.weight"] = (
                np.ascontiguousarray(np.asarray(ds["reduction"]["kernel"]).T)
            )
        norm(f"backbone.norm{si}", init[f"out_norm{si}"])

    tree = convert_swin(d, "tiny")
    assert _tree_spec(tree) == _tree_spec(init)
    flat_init = dict(jax.tree_util.tree_leaves_with_path(init))
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_init[path]),
            err_msg=jax.tree_util.keystr(path),
        )
    out = model.apply({"params": tree}, x)
    assert np.isfinite(np.asarray(out["res5"])).all()
