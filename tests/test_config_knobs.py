"""Every config knob wired in the round-4 sweep drives real behavior.

Covers: ``min_size_train_sampling`` styles, ``test.window_inference``,
``ParallelConfig`` mesh layout, ``solver.optimizer``/``weight_decay_embed``
groups, resampler ``conv_kernels``, eval ``model.size_divisibility``, and
Swin ``drop_path_rate`` stochastic depth (reference knobs:
``ytvis_dataset_mapper.py:310-318``, ``openvis/config.py:117``,
``train_net.py:150-176``, ``resampler.py``, ``swin.py``).
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_min_size_sampling_styles():
    from openvis_tpu.data.transforms import ClipAugmenter

    rng = np.random.RandomState(0)
    frames = [np.zeros((100, 160, 3), np.uint8)] * 2

    # range: shorts drawn uniformly in [min, max], not just the endpoints
    aug = ClipAugmenter((240, 480), 1333, is_train=True, flip=False,
                        sampling="range")
    shorts = set()
    for _ in range(40):
        out, _, size = aug(np.random.RandomState(_), frames)
        shorts.add(size[0])
    assert min(shorts) >= 240 and max(shorts) <= 480
    assert len(shorts) > 2, "range sampling should hit interior sizes"

    # choice: only listed sizes appear
    aug_c = ClipAugmenter((240, 480), 1333, is_train=True, flip=False,
                          sampling="choice_by_clip")
    shorts_c = {aug_c(np.random.RandomState(i), frames)[2][0]
                for i in range(20)}
    assert shorts_c <= {240, 480}

    with pytest.raises(ValueError, match="min_size_train_sampling"):
        ClipAugmenter((240,), 1333, sampling="bogus")


def test_window_inference_knob():
    from openvis_tpu.config import Config
    from openvis_tpu.engine import window_size

    cfg = Config()
    t = dataclasses.replace(cfg.model.test, window_inference=True,
                            window_size=10, max_frames=64)
    cfg_w = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, test=t))
    assert window_size(cfg_w) == 10
    t2 = dataclasses.replace(t, window_inference=False)
    cfg_s = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, test=t2))
    assert window_size(cfg_s) == 64


def test_mesh_layout():
    from openvis_tpu.parallel.mesh import batch_spec, data_sharding, make_mesh

    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8}
    mesh2 = make_mesh(8, time=2)
    assert dict(mesh2.shape) == {"data": 4, "time": 2}
    assert batch_spec(mesh2) == jax.sharding.PartitionSpec(("data", "time"))
    # a (8,)-leading batch shards fully over the 2-D mesh
    x = jax.device_put(np.arange(8.0), data_sharding(mesh2))
    assert len(x.sharding.device_set) == 8
    with pytest.raises(ValueError, match="time_axis"):
        make_mesh(6, time=4)


def test_optimizer_knob_and_embed_group():
    from openvis_tpu.config import Config
    from openvis_tpu.parallel.train_step import label_params, make_optimizer

    params = {
        "segmenter": {
            "predictor": {
                "query_feat": {"embedding": jnp.ones((4, 8))},
                "lin": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros(8)},
            }
        }
    }
    labels = label_params(params)
    assert labels["segmenter"]["predictor"]["query_feat"]["embedding"] == "embed"
    assert labels["segmenter"]["predictor"]["lin"]["kernel"] == "main"
    assert labels["segmenter"]["predictor"]["lin"]["bias"] == "nodecay"

    cfg = Config()
    # sgd builds and takes a step
    cfg_sgd = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, optimizer="sgd")
    )
    tx = make_optimizer(cfg_sgd, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(
        np.asarray(updates["segmenter"]["predictor"]["lin"]["kernel"])
    ).all()

    cfg_bad = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, optimizer="lamb")
    )
    with pytest.raises(ValueError, match="solver.optimizer"):
        make_optimizer(cfg_bad, params)

    # weight_decay_embed drives the embed group's decay: a large value must
    # change the embedding update while the kernel update stays put
    cfg_wd = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, weight_decay_embed=10.0,
                                        clip_gradients=False)
    )
    cfg_0 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, weight_decay_embed=0.0,
                                        clip_gradients=False)
    )
    u_wd, _ = (t := make_optimizer(cfg_wd, params)).update(grads, t.init(params), params)
    u_0, _ = (t0 := make_optimizer(cfg_0, params)).update(grads, t0.init(params), params)
    emb_wd = np.asarray(u_wd["segmenter"]["predictor"]["query_feat"]["embedding"])
    emb_0 = np.asarray(u_0["segmenter"]["predictor"]["query_feat"]["embedding"])
    # delta is exactly wd*lr*param = 10*1e-4*1 = 1e-3; allow equality
    assert np.abs(emb_wd - emb_0).max() >= 9e-4
    np.testing.assert_array_equal(
        np.asarray(u_wd["segmenter"]["predictor"]["lin"]["kernel"]),
        np.asarray(u_0["segmenter"]["predictor"]["lin"]["kernel"]),
    )


def test_swin_embed_groups_no_decay():
    # relative_position_bias_table / absolute_pos_embed must land in the
    # backbone embed group (wd=0); the reference forces their weight decay
    # to 0.0 (train_net.py:168-170)
    from openvis_tpu.parallel.train_step import label_params

    params = {
        "backbone": {
            "layers0": {
                "blocks0": {
                    "attn": {
                        "relative_position_bias_table": jnp.ones((9, 2)),
                        "qkv": {"kernel": jnp.ones((8, 24))},
                    }
                }
            },
            "absolute_pos_embed": jnp.ones((1, 16, 8)),
        }
    }
    labels = label_params(params)
    attn = labels["backbone"]["layers0"]["blocks0"]["attn"]
    assert attn["relative_position_bias_table"] == "backbone_embed"
    assert attn["qkv"]["kernel"] == "backbone"
    assert labels["backbone"]["absolute_pos_embed"] == "backbone_embed"


def test_resampler_even_conv_kernels_rejected():
    from openvis_tpu.models.resampler import TemporalResampler

    rs = TemporalResampler(hidden_dim=16, feed_dim=32, nheads=2, nlayers=1,
                           conv_kernels=(4, 3))
    x = jnp.ones((1, 4, 2, 16))
    mask_feats = jnp.ones((4, 4, 4, 16))
    attn_feats = jnp.ones((4, 2, 2, 2, 16))
    with pytest.raises(ValueError, match="conv_kernels"):
        rs.init(jax.random.PRNGKey(0), x, mask_feats, attn_feats)


def test_resampler_conv_kernels():
    from openvis_tpu.models.resampler import TemporalResampler

    rs = TemporalResampler(hidden_dim=16, feed_dim=32, nheads=2, nlayers=1,
                           conv_kernels=(7, 5))
    x = jnp.ones((2, 6, 3, 16))  # (B, T, Q, C) layout per module docstring
    mask_feats = jnp.ones((12, 4, 4, 16))   # (B*T, H, W, C)
    attn_feats = jnp.ones((12, 2, 2, 2, 16))  # (B*T, nH, h, w, C)
    params = rs.init(jax.random.PRNGKey(0), x, mask_feats, attn_feats)["params"]
    k1 = params["short0_conv1"]["kernel"]
    k2 = params["short0_conv2"]["kernel"]
    assert k1.shape[0] == 7 and k2.shape[0] == 5


def test_eval_size_divisibility():
    from openvis_tpu.data.mapper import _pad_sample
    from openvis_tpu.config import InputConfig

    inp = InputConfig()
    frames = [np.zeros((100, 150, 3), np.uint8)] * 2
    masks = np.zeros((0, 2, 100, 150), np.uint8)
    labels = np.zeros((0,), np.int32)
    fv = np.zeros((0, 2), bool)
    inp_small = dataclasses.replace(inp, pad_size=(100, 150))
    s64 = _pad_sample(frames, masks, labels, fv, inp_small, (0, 0, 0),
                      (1, 1, 1), div=64)
    assert s64["pixels"].shape[1] % 64 == 0
    assert s64["pixels"].shape[2] % 64 == 0


def test_swin_drop_path_stochastic():
    from openvis_tpu.models.backbone.swin import SwinTransformer

    m = SwinTransformer(embed_dim=8, depths=(2,), num_heads=(2,),
                        window_size=4, drop_path_rate=0.5,
                        out_features=("res2",))
    x = jnp.ones((4, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    # no dropout rng -> deterministic (eval/parity path)
    a = m.apply({"params": params}, x)
    b = m.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(a["res2"]), np.asarray(b["res2"]))
    # dropout rng supplied -> stochastic depth active (train path)
    c = m.apply({"params": params}, x, rngs={"dropout": jax.random.PRNGKey(1)})
    d = m.apply({"params": params}, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(c["res2"]) - np.asarray(d["res2"])).max() > 0
