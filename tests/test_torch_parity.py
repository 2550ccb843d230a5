"""Golden-trace parity vs PyTorch re-typings of the reference modules.

The reference stack (torch + detectron2) can't be imported here (no
detectron2 in the container), so each test re-types the reference module
minimally in torch — mirroring the cited reference code line-for-line in
BEHAVIOR (not source) — loads OUR initialized params into it, and asserts
the JAX forward matches:

  * decoder layer = masked cross-attention -> self-attention -> FFN
    (``video_mask2former_transformer_decoder.py:29-200``, post-norm);
  * biased CLIP residual block (``side_adapter.py:70``'s
    BiasedResidualAttentionBlock — torch nn.MultiheadAttention with a float
    additive attn_mask + QuickGELU MLP);
  * Hungarian matcher costs + assignment (``matcher.py:16-136``): shared
    sampled points, batch sigmoid-CE/dice costs, scipy assignment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from openvis_tpu.models.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    SelfAttentionLayer,
)

D, H = 32, 4


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_mha(p, mha):
    """Our split q/k/v/out projections -> torch packed in_proj."""
    with torch.no_grad():
        mha.in_proj_weight.copy_(_t(np.concatenate([
            np.asarray(p["q_proj"]["kernel"]).T,
            np.asarray(p["k_proj"]["kernel"]).T,
            np.asarray(p["v_proj"]["kernel"]).T,
        ], axis=0)))
        mha.in_proj_bias.copy_(_t(np.concatenate([
            np.asarray(p["q_proj"]["bias"]),
            np.asarray(p["k_proj"]["bias"]),
            np.asarray(p["v_proj"]["bias"]),
        ])))
        mha.out_proj.weight.copy_(_t(np.asarray(p["out_proj"]["kernel"]).T))
        mha.out_proj.bias.copy_(_t(np.asarray(p["out_proj"]["bias"])))


def _copy_ln(p, ln):
    with torch.no_grad():
        ln.weight.copy_(_t(p["scale"]))
        ln.bias.copy_(_t(p["bias"]))


def _copy_linear(p, lin):
    with torch.no_grad():
        lin.weight.copy_(_t(np.asarray(p["kernel"]).T))
        lin.bias.copy_(_t(p["bias"]))


def test_decoder_layer_matches_torch():
    """One full decoder layer (masked cross-attn -> self-attn -> FFN,
    post-norm) vs the re-typed reference layer stack
    (video_mask2former_transformer_decoder.py:29-200)."""
    rng = np.random.RandomState(0)
    b, q, lk = 2, 6, 20
    tgt = rng.randn(b, q, D).astype(np.float32)
    mem = rng.randn(b, lk, D).astype(np.float32)
    pos = rng.randn(1, lk, D).astype(np.float32)
    qpos = rng.randn(1, q, D).astype(np.float32)
    # boolean disallowed mask with at least one allowed key per query
    disallow = rng.rand(b, q, lk) < 0.4
    disallow[..., 0] = False
    bias = np.where(disallow, -1e9, 0.0).astype(np.float32)[:, None]

    ca = CrossAttentionLayer(D, H)
    sa = SelfAttentionLayer(D, H)
    ff = FFNLayer(D, 64)
    pc = ca.init(jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(mem),
                 jnp.asarray(pos), jnp.asarray(qpos))["params"]
    x1 = ca.apply({"params": pc}, jnp.asarray(tgt), jnp.asarray(mem),
                  jnp.asarray(pos), jnp.asarray(qpos), jnp.asarray(bias))
    ps = sa.init(jax.random.PRNGKey(1), x1, jnp.asarray(qpos))["params"]
    x2 = sa.apply({"params": ps}, x1, jnp.asarray(qpos))
    pf = ff.init(jax.random.PRNGKey(2), x2)["params"]
    ours = np.asarray(ff.apply({"params": pf}, x2))

    # --- torch re-typing (reference forward_post paths) ---
    mha_c = torch.nn.MultiheadAttention(D, H)
    norm_c = torch.nn.LayerNorm(D)
    _copy_mha(pc["multihead_attn"], mha_c)
    _copy_ln(pc["norm"], norm_c)
    mha_s = torch.nn.MultiheadAttention(D, H)
    norm_s = torch.nn.LayerNorm(D)
    _copy_mha(ps["self_attn"], mha_s)
    _copy_ln(ps["norm"], norm_s)
    lin1 = torch.nn.Linear(D, 64)
    lin2 = torch.nn.Linear(64, D)
    norm_f = torch.nn.LayerNorm(D)
    _copy_linear(pf["linear1"], lin1)
    _copy_linear(pf["linear2"], lin2)
    _copy_ln(pf["norm"], norm_f)

    with torch.no_grad():
        t_tgt = _t(tgt).transpose(0, 1)     # (L, B, C) torch layout
        t_mem = _t(mem).transpose(0, 1)
        t_pos = _t(np.broadcast_to(pos, (b, lk, D))).transpose(0, 1)
        t_qp = _t(np.broadcast_to(qpos, (b, q, D))).transpose(0, 1)
        # float additive mask per head: (B*H, Q, K)
        t_mask = _t(np.repeat(bias, H, axis=1).reshape(b * H, q, lk))
        y = mha_c(t_tgt + t_qp, t_mem + t_pos, t_mem, attn_mask=t_mask,
                  need_weights=False)[0]
        x = norm_c(t_tgt + y)                              # cross, post-norm
        y = mha_s(x + t_qp, x + t_qp, x, need_weights=False)[0]
        x = norm_s(x + y)                                  # self, post-norm
        y = lin2(torch.relu(lin1(x)))
        x = norm_f(x + y)                                  # FFN, post-norm
        theirs = x.transpose(0, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_biased_clip_block_matches_torch():
    """CLIP residual block with per-head additive attention bias — the SAN
    post_encode building block (side_adapter.py:70 BiasedResidualAttention
    Block; vendored CLIP model.py ResidualAttentionBlock semantics)."""
    from openvis_tpu.models.clip.model import ResidualAttentionBlock

    rng = np.random.RandomState(1)
    b, l = 2, 10
    x = rng.randn(b, l, D).astype(np.float32)
    bias = (rng.randn(b, H, l, l) * 2).astype(np.float32)

    blk = ResidualAttentionBlock(D, H)
    p = blk.init(jax.random.PRNGKey(0), jnp.asarray(x),
                 attn_bias=jnp.asarray(bias))["params"]
    ours = np.asarray(blk.apply({"params": p}, jnp.asarray(x),
                                attn_bias=jnp.asarray(bias)))

    mha = torch.nn.MultiheadAttention(D, H)
    ln1 = torch.nn.LayerNorm(D)
    ln2 = torch.nn.LayerNorm(D)
    c_fc = torch.nn.Linear(D, 4 * D)
    c_proj = torch.nn.Linear(4 * D, D)
    _copy_mha(p["attn"], mha)
    _copy_ln(p["ln_1"]["ln"], ln1)  # LayerNormF32 wraps an inner "ln"
    _copy_ln(p["ln_2"]["ln"], ln2)
    _copy_linear(p["mlp_c_fc"], c_fc)
    _copy_linear(p["mlp_c_proj"], c_proj)

    with torch.no_grad():
        t_x = _t(x).transpose(0, 1)                        # (L, B, D)
        t_bias = _t(bias.reshape(b * H, l, l))
        y = ln1(t_x)
        t_x = t_x + mha(y, y, y, attn_mask=t_bias, need_weights=False)[0]
        y = ln2(t_x)
        h = c_fc(y)
        t_x = t_x + c_proj(h * torch.sigmoid(1.702 * h))   # QuickGELU
        theirs = t_x.transpose(0, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_swin_shifted_block_matches_torch_retyping():
    """One SW-MSA Swin block (shift > 0, non-window-divisible H/W) vs a torch
    re-typing of the reference swin.py: pad -> cyclic roll -> window
    partition -> packed-QKV attention + relative-position-bias gather +
    cross-region mask -> reverse -> unroll -> crop -> exact-GELU MLP."""
    import torch.nn.functional as F

    from openvis_tpu.models.backbone.swin import (
        SwinBlock,
        _relative_position_index,
        _shift_attn_mask,
    )

    rng = np.random.RandomState(9)
    b, h, w, c, heads, ws = 1, 10, 13, 16, 4, 7
    shift = ws // 2
    x = rng.randn(b, h, w, c).astype(np.float32)
    blk = SwinBlock(dim=c, num_heads=heads, window_size=ws, shift=shift)
    p = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # random rel-pos table (init is ~0 which would mask gather bugs)
    p["attn"]["relative_position_bias_table"] = jnp.asarray(
        rng.randn((2 * ws - 1) ** 2, heads).astype(np.float32)
    )
    ours = np.asarray(blk.apply({"params": p}, jnp.asarray(x)))

    ph, pw = 14, 14
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = F.layer_norm(t, (c,),
                         _t(p["norm1"]["scale"]), _t(p["norm1"]["bias"]))
        y = F.pad(y, (0, 0, 0, pw - w, 0, ph - h))
        y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        # window partition (B, ph, pw, C) -> (nW, ws*ws, C)
        wins = (y.reshape(b, ph // ws, ws, pw // ws, ws, c)
                 .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c))
        qkv_w = _t(np.asarray(p["attn"]["qkv"]["kernel"]).T)
        qkv_b = _t(p["attn"]["qkv"]["bias"])
        qkv = wins @ qkv_w.T + qkv_b
        n = ws * ws
        q, k, v = qkv.reshape(-1, n, 3, heads, c // heads).permute(
            2, 0, 3, 1, 4
        )  # (3, nW, H, n, dh)
        attn = (q @ k.transpose(-2, -1)) / (c // heads) ** 0.5
        idx = torch.from_numpy(_relative_position_index(ws).reshape(-1)).long()
        table = _t(p["attn"]["relative_position_bias_table"])
        bias = table[idx].reshape(n, n, heads).permute(2, 0, 1)
        attn = attn + bias[None]
        mask = torch.from_numpy(_shift_attn_mask(ph, pw, ws, shift))
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(-1, heads, n, n).softmax(-1)
        wins = (attn @ v).transpose(1, 2).reshape(-1, n, c)
        proj_w = _t(np.asarray(p["attn"]["proj"]["kernel"]).T)
        wins = wins @ proj_w.T + _t(p["attn"]["proj"]["bias"])
        y = (wins.reshape(b, ph // ws, pw // ws, ws, ws, c)
                 .permute(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c))
        y = torch.roll(y, (shift, shift), dims=(1, 2))[:, :h, :w]
        t = t + y
        y = F.layer_norm(t, (c,),
                         _t(p["norm2"]["scale"]), _t(p["norm2"]["bias"]))
        fc1_w = _t(np.asarray(p["mlp_fc1"]["kernel"]).T)
        fc2_w = _t(np.asarray(p["mlp_fc2"]["kernel"]).T)
        y = F.gelu(y @ fc1_w.T + _t(p["mlp_fc1"]["bias"]))
        y = y @ fc2_w.T + _t(p["mlp_fc2"]["bias"])
        theirs = (t + y).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_resnet50_matches_torch_retyping():
    """Full R50 trunk vs a torch re-typing of the d2 backbone (basic stem,
    bottlenecks, STRIDE_IN_1X1=False -> stride on the 3x3, FrozenBN as
    affine).  Random conv weights + random affines via our init; catches
    padding/stride-placement/NHWC-conversion drift."""
    import torch.nn.functional as F

    from openvis_tpu.models.backbone.resnet import ResNet, _STAGE_BLOCKS

    rng = np.random.RandomState(8)
    model = ResNet(depth=50)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # randomize the affines (init is 1/0 which would hide order bugs)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(str(getattr(k, "key", k)) for k in p) else v,
        params,
    )
    feats = model.apply({"params": params}, jnp.asarray(x))

    def conv(y, p, stride=1, pad=0):
        w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        return F.conv2d(y, w, stride=stride, padding=pad)

    def aff(y, p):
        s = torch.from_numpy(np.asarray(p["scale"]))[None, :, None, None]
        b = torch.from_numpy(np.asarray(p["bias"]))[None, :, None, None]
        return y * s + b

    with torch.no_grad():
        y = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = F.relu(aff(conv(y, params["stem_conv1"], 2, 3),
                       params["stem_norm1"]))
        y = F.max_pool2d(y, 3, stride=2, padding=1)
        for si, nb in enumerate(_STAGE_BLOCKS[50]):
            name = f"res{si + 2}"
            for b in range(nb):
                p = params[f"{name}_block{b}"]
                stride = 2 if (b == 0 and si > 0) else 1
                short = y
                if b == 0:
                    short = aff(conv(y, p["shortcut_conv"], stride),
                                p["shortcut_norm"])
                z = F.relu(aff(conv(y, p["conv1"], 1), p["norm1"]))
                z = F.relu(aff(conv(z, p["conv2"], stride, 1), p["norm2"]))
                z = aff(conv(z, p["conv3"], 1), p["norm3"])
                y = F.relu(z + short)
            np.testing.assert_allclose(
                np.asarray(feats[name]),
                y.permute(0, 2, 3, 1).numpy(),
                rtol=1e-3, atol=1e-3,
            )


def test_position_encoding_matches_reference_cumsum_form():
    """Sine PE parity vs a re-typing of the reference's cumsum-over-mask
    construction (position_encoding.py:61-116): with a fully-valid mask the
    cumsum is 1..N and normalization divides by the last value + eps.  Off-
    by-one or scale drift here silently degrades every attention layer."""
    from openvis_tpu.models.position_encoding import (
        position_encoding_2d,
        position_encoding_3d,
    )

    h, w, f = 7, 9, 64
    ours = np.asarray(position_encoding_2d(h, w, f))

    # reference re-typing (numpy): not_mask.cumsum -> normalize -> sin/cos
    not_mask = np.ones((h, w), np.float32)
    y_embed = not_mask.cumsum(0)
    x_embed = not_mask.cumsum(1)
    eps, scale = 1e-6, 2 * np.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = 10000.0 ** (2 * (np.arange(f) // 2) / f)
    px = x_embed[..., None] / dim_t
    py = y_embed[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, f)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, f)
    ref = np.concatenate([py, px], axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # 3D: spatial halves + temporal term ADDED (position_encoding.py:118-164)
    t = 3
    ours3 = np.asarray(position_encoding_3d(t, h, w, 2 * f))
    z_embed = np.arange(1, t + 1, dtype=np.float32) / (t + eps) * scale
    dz = 10000.0 ** (2 * (np.arange(2 * f) // 2) / (2 * f))
    pz = z_embed[:, None] / dz
    pz = np.stack([np.sin(pz[:, 0::2]), np.cos(pz[:, 1::2])], -1).reshape(t, 2 * f)
    ref3 = ref[None] + pz[:, None, None, :]
    np.testing.assert_allclose(ours3, ref3, rtol=1e-5, atol=1e-6)


def test_criterion_losses_match_torch():
    """Loss VALUES parity: weighted CE (eos_coef empty weight,
    criterion.py:123-137) + point-sampled sigmoid-CE/dice with uncertainty
    selection (criterion.py:26-69,156-181), given identical assignments and
    identical sampled points (our shared-candidate draw replicated)."""
    import torch.nn.functional as F

    from openvis_tpu.losses.criterion import (
        CriterionSettings,
        _loss_labels,
        _loss_masks,
        match,
    )
    from openvis_tpu.structures import ClipTargets

    rng = np.random.RandomState(6)
    b, q, n, t, h, w, k = 2, 5, 3, 2, 16, 16, 4
    s = CriterionSettings(
        num_classes=k, num_points=32, oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    logits = rng.randn(b, q, k + 1).astype(np.float32)
    masks = (rng.randn(b, q, t, h, w) * 2).astype(np.float32)
    tmask = (rng.rand(b, n, t, h, w) > 0.6).astype(np.float32)
    labels = rng.randint(0, k, (b, n)).astype(np.int32)
    valid = np.array([[True, True, False], [True, True, True]])
    targets = ClipTargets(
        labels=jnp.asarray(labels), masks=jnp.asarray(tmask),
        valid=jnp.asarray(valid),
        frame_valid=jnp.ones((b, n, t), bool),
    )
    key = jax.random.PRNGKey(9)
    assignment = np.asarray(
        match(key, jnp.asarray(logits), jnp.asarray(masks), targets, s)
    )
    num_masks = max(float(valid.sum()), 1.0)

    ours_ce = float(_loss_labels(jnp.asarray(logits), jnp.asarray(assignment),
                                 targets, s))
    ours_mask, ours_dice = map(float, _loss_masks(
        key, jnp.asarray(masks), jnp.asarray(assignment), targets,
        jnp.asarray(num_masks), s,
    ))

    # --- torch CE with empty-class weight (criterion.py:123-137) ---
    tc = np.full((b, q), k, np.int64)
    for bi in range(b):
        for ni in range(n):
            if valid[bi, ni]:
                tc[bi, assignment[bi, ni]] = labels[bi, ni]
    weight = torch.ones(k + 1)
    weight[k] = s.eos_coef
    theirs_ce = F.cross_entropy(
        torch.from_numpy(logits).transpose(1, 2), torch.from_numpy(tc), weight
    )
    np.testing.assert_allclose(ours_ce, float(theirs_ce), rtol=1e-5)

    # --- torch point losses at OUR sampled points ---
    # replicate the shared-candidate draw + per-row uncertainty top-k
    # (sorted-order-statistics generation; same helper = same point sets)
    from openvis_tpu.ops.point_sample import sorted_uniform_points

    k1, k2 = jax.random.split(key)
    n_sampled = int(s.num_points * s.oversample_ratio)
    n_uncertain = int(s.importance_sample_ratio * s.num_points)
    n_random = s.num_points - n_uncertain
    cand = np.asarray(sorted_uniform_points(k1, (b,), n_sampled))
    rnd = np.asarray(sorted_uniform_points(k2, (b,), n_random))

    def t_sample(maps, pts):
        # maps (R, T, H, W), pts (P, 2) xy in [0,1] -> (R, T*P)
        g = torch.from_numpy(
            np.broadcast_to(pts[None, None], (maps.shape[0], 1, *pts.shape))
            .copy()) * 2 - 1
        out = F.grid_sample(torch.from_numpy(maps), g, align_corners=False)
        return out[:, :, 0].flatten(1)

    tm, td = 0.0, 0.0
    for bi in range(b):
        src = masks[bi][assignment[bi]]                    # (N, T, H, W)
        srows = src.reshape(n * t, 1, h, w)
        trows = tmask[bi].reshape(n * t, 1, h, w)
        cl = t_sample(srows, cand[bi])                     # (NT, S)
        tl = t_sample(trows, cand[bi])
        idx = torch.topk(-cl.abs(), n_uncertain, dim=-1).indices
        pl = torch.gather(cl, 1, idx)
        plab = torch.gather(tl, 1, idx)
        if n_random:
            pl = torch.cat([pl, t_sample(srows, rnd[bi])], dim=1)
            plab = torch.cat([plab, t_sample(trows, rnd[bi])], dim=1)
        row_w = torch.from_numpy(
            np.repeat(valid[bi].astype(np.float32), t)
        )
        ce = F.binary_cross_entropy_with_logits(pl, plab, reduction="none")
        tm += float((ce.mean(-1) * row_w).sum())
        sig = pl.sigmoid()
        numer = 2 * (sig * plab).sum(-1)
        denom = sig.sum(-1) + plab.sum(-1)
        dice = 1 - (numer + 1) / (denom + 1)
        td += float((dice * row_w).sum())
    np.testing.assert_allclose(ours_mask, tm / num_masks, rtol=1e-4)
    np.testing.assert_allclose(ours_dice, td / num_masks, rtol=1e-4)


def test_resampler_temporal_layer_matches_torch():
    """One temporal-resampler layer (long post-norm self-attn over T ->
    replicate-padded conv1d k5 -> relu -> k3, residual -> LayerNorm -> FFN)
    vs the re-typed reference layer (resampler.py:244-316)."""
    import torch.nn.functional as F

    from openvis_tpu.models.resampler import TemporalResampler

    rng = np.random.RandomState(4)
    b, t, q = 2, 6, 3
    frame_embeds = rng.randn(b, t, q, D).astype(np.float32)

    rs = TemporalResampler(hidden_dim=D, feed_dim=64, nheads=H, nlayers=1)
    p = rs.init(
        jax.random.PRNGKey(0),
        jnp.asarray(frame_embeds),
        method=TemporalResampler.final_embeds,
    )["params"]
    ours = np.asarray(
        rs.apply({"params": p}, jnp.asarray(frame_embeds),
                 method=TemporalResampler.final_embeds)
    )  # (B, T, Q, D)

    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    ln_long = torch.nn.LayerNorm(D)
    conv1 = torch.nn.Conv1d(D, D, 5)
    conv2 = torch.nn.Conv1d(D, D, 3)
    ln_agg = torch.nn.LayerNorm(D)
    lin1 = torch.nn.Linear(D, 64)
    lin2 = torch.nn.Linear(64, D)
    ln_ffn = torch.nn.LayerNorm(D)
    ln_dec = torch.nn.LayerNorm(D)
    _copy_mha(p["long0"], mha)
    _copy_ln(p["long_norm0"], ln_long)
    with torch.no_grad():
        # flax Conv kernel (k, in, out) -> torch (out, in, k)
        conv1.weight.copy_(_t(np.transpose(
            np.asarray(p["short0_conv1"]["kernel"]), (2, 1, 0))))
        conv1.bias.copy_(_t(p["short0_conv1"]["bias"]))
        conv2.weight.copy_(_t(np.transpose(
            np.asarray(p["short0_conv2"]["kernel"]), (2, 1, 0))))
        conv2.bias.copy_(_t(p["short0_conv2"]["bias"]))
    _copy_ln(p["agg_norm0"], ln_agg)
    _copy_linear(p["ffn0"]["linear1"], lin1)
    _copy_linear(p["ffn0"]["linear2"], lin2)
    _copy_ln(p["ffn0"]["norm"], ln_ffn)
    _copy_ln(p["decode_norm"], ln_dec)

    with torch.no_grad():
        # (B, T, Q, D) -> (B*Q, T, D) temporal sequences per query
        x = _t(frame_embeds).permute(0, 2, 1, 3).reshape(b * q, t, D)
        attn = mha(x, x, x, need_weights=False)[0]
        x = ln_long(x + attn)
        y = x.transpose(1, 2)                                # (BQ, D, T)
        y = conv1(F.pad(y, (2, 2), mode="replicate"))
        y = torch.relu(y)
        y = conv2(F.pad(y, (1, 1), mode="replicate"))
        x = ln_agg(y.transpose(1, 2) + x)
        x = ln_ffn(x + lin2(torch.relu(lin1(x))))            # FFN post-norm
        x = ln_dec(x)
        theirs = x.reshape(b, q, t, D).permute(0, 2, 1, 3).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_matcher_costs_and_assignment_match_torch():
    """Hungarian matcher parity: identical shared sampled points through the
    re-typed reference cost pipeline (matcher.py:16-58 batch dice/CE,
    :110-136 cost assembly + scipy assignment) vs our fused on-device
    match()."""
    import torch.nn.functional as F
    from scipy.optimize import linear_sum_assignment

    from openvis_tpu.losses.criterion import (
        CriterionSettings,
        match,
        match_costs,
    )
    from openvis_tpu.structures import ClipTargets

    rng = np.random.RandomState(2)
    b, q, n, t, h, w = 2, 6, 3, 2, 16, 16
    k = 5
    p = 64
    logits = rng.randn(b, q, k + 1).astype(np.float32)
    masks = (rng.randn(b, q, t, h, w) * 2).astype(np.float32)
    tmask = (rng.rand(b, n, t, h, w) > 0.6).astype(np.float32)
    labels = rng.randint(0, k, (b, n)).astype(np.int32)
    targets = ClipTargets(
        labels=jnp.asarray(labels), masks=jnp.asarray(tmask),
        valid=jnp.ones((b, n), bool),
        frame_valid=jnp.ones((b, n, t), bool),
    )
    s = CriterionSettings(num_classes=k, num_points=p)
    key = jax.random.PRNGKey(3)
    cost = np.asarray(match_costs(key, jnp.asarray(logits),
                                  jnp.asarray(masks), targets, s))
    assignment = np.asarray(match(key, jnp.asarray(logits),
                                  jnp.asarray(masks), targets, s))

    # identical shared points (replicates match_costs's internal draw)
    from openvis_tpu.ops.point_sample import sorted_uniform_points

    coords = np.asarray(sorted_uniform_points(key, (b,), p))

    def t_point_sample(maps, pts):
        # maps (R, T, H, W); pts (R, P, 2) in [0,1] xy -> (R, T*P)
        g = torch.from_numpy(pts)[:, None] * 2 - 1        # (R,1,P,2)
        out = F.grid_sample(torch.from_numpy(maps), g, align_corners=False)
        return out[:, :, 0].flatten(1)                    # (R, T*P)

    for bi in range(b):
        out_prob = torch.from_numpy(logits[bi]).softmax(-1)
        cost_class = -out_prob[:, labels[bi]]              # (Q, N)
        pts = np.broadcast_to(coords[bi], (q, p, 2)).copy()
        out_pts = t_point_sample(masks[bi], pts)           # (Q, T*P)
        tgt_pts = t_point_sample(
            tmask[bi], np.broadcast_to(coords[bi], (n, p, 2)).copy()
        )                                                  # (N, T*P)
        hw = out_pts.shape[1]
        # batch_sigmoid_ce_loss (matcher.py:37-58)
        pos = F.binary_cross_entropy_with_logits(
            out_pts, torch.ones_like(out_pts), reduction="none")
        neg = F.binary_cross_entropy_with_logits(
            out_pts, torch.zeros_like(out_pts), reduction="none")
        cost_mask = (
            torch.einsum("nc,mc->nm", pos, tgt_pts)
            + torch.einsum("nc,mc->nm", neg, 1 - tgt_pts)
        ) / hw
        # batch_dice_loss (matcher.py:16-31)
        sig = out_pts.sigmoid()
        numer = 2 * torch.einsum("nc,mc->nm", sig, tgt_pts)
        denom = sig.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
        cost_dice = 1 - (numer + 1) / (denom + 1)
        C = (s.mask_weight * cost_mask + s.class_weight * cost_class
             + s.dice_weight * cost_dice).numpy()          # (Q, N)

        np.testing.assert_allclose(cost[bi], C.T, rtol=1e-4, atol=1e-4)
        ri, ci = linear_sum_assignment(C)
        # scipy rows=queries, cols=targets; ours: query per target slot
        want = np.zeros(n, np.int64)
        want[ci] = ri
        np.testing.assert_array_equal(assignment[bi], want)


@pytest.mark.parametrize("pre_norm", [False, True])
def test_detr_transformer_matches_torch(pre_norm):
    """Plain DETR transformer (encoder+decoder halves,
    pixel_decoder/transformer.py:19-151) vs a torch re-typing: per-layer
    MultiheadAttention/LayerNorm/Linear applied in the reference forward
    order, with return_intermediate decoder activations."""
    from openvis_tpu.models.pixel_decoder import DETRTransformer

    rng = np.random.RandomState(7)
    b, h, w, q, ffd, n_enc, n_dec = 2, 4, 5, 6, 48, 2, 2
    src = rng.randn(b, h, w, D).astype(np.float32)
    pos = rng.randn(1, h, w, D).astype(np.float32)
    qemb = rng.randn(q, D).astype(np.float32)

    tr = DETRTransformer(D, H, n_enc, n_dec, ffd, pre_norm)
    params = tr.init(jax.random.PRNGKey(0), jnp.asarray(src),
                     jnp.asarray(qemb), jnp.asarray(pos))["params"]
    hs, memory = tr.apply({"params": params}, jnp.asarray(src),
                          jnp.asarray(qemb), jnp.asarray(pos))
    hs, memory = np.asarray(hs), np.asarray(memory)
    assert hs.shape == (n_dec, b, q, D)
    assert memory.shape == (b, h, w, D)

    t_src = _t(src.reshape(b, h * w, D)).transpose(0, 1)      # (HW, B, C)
    t_pos = _t(np.broadcast_to(
        pos.reshape(1, h * w, D), (b, h * w, D))).transpose(0, 1)
    t_q = _t(np.broadcast_to(qemb[None], (b, q, D))).transpose(0, 1)

    def enc_layer(p, x):
        mha = torch.nn.MultiheadAttention(D, H)
        _copy_mha(p["self_attn"], mha)
        n1, n2 = torch.nn.LayerNorm(D), torch.nn.LayerNorm(D)
        _copy_ln(p["norm1"], n1)
        _copy_ln(p["norm2"], n2)
        l1, l2 = torch.nn.Linear(D, ffd), torch.nn.Linear(ffd, D)
        _copy_linear(p["linear1"], l1)
        _copy_linear(p["linear2"], l2)
        if pre_norm:
            x2 = n1(x)
            x = x + mha(x2 + t_pos, x2 + t_pos, x2, need_weights=False)[0]
            return x + l2(torch.relu(l1(n2(x))))
        x = n1(x + mha(x + t_pos, x + t_pos, x, need_weights=False)[0])
        return n2(x + l2(torch.relu(l1(x))))

    def dec_layer(p, x, mem):
        sa = torch.nn.MultiheadAttention(D, H)
        ca = torch.nn.MultiheadAttention(D, H)
        _copy_mha(p["self_attn"], sa)
        _copy_mha(p["multihead_attn"], ca)
        n1, n2, n3 = (torch.nn.LayerNorm(D), torch.nn.LayerNorm(D),
                      torch.nn.LayerNorm(D))
        _copy_ln(p["norm1"], n1)
        _copy_ln(p["norm2"], n2)
        _copy_ln(p["norm3"], n3)
        l1, l2 = torch.nn.Linear(D, ffd), torch.nn.Linear(ffd, D)
        _copy_linear(p["linear1"], l1)
        _copy_linear(p["linear2"], l2)
        if pre_norm:
            x2 = n1(x)
            x = x + sa(x2 + t_q, x2 + t_q, x2, need_weights=False)[0]
            x2 = n2(x)
            x = x + ca(x2 + t_q, mem + t_pos, mem, need_weights=False)[0]
            return x + l2(torch.relu(l1(n3(x))))
        x = n1(x + sa(x + t_q, x + t_q, x, need_weights=False)[0])
        x = n2(x + ca(x + t_q, mem + t_pos, mem, need_weights=False)[0])
        return n3(x + l2(torch.relu(l1(x))))

    with torch.no_grad():
        x = t_src
        for i in range(n_enc):
            x = enc_layer(params[f"encoder_layer{i}"], x)
        if pre_norm:
            en = torch.nn.LayerNorm(D)
            _copy_ln(params["encoder_norm"], en)
            x = en(x)
        mem = x
        dn = torch.nn.LayerNorm(D)
        _copy_ln(params["decoder_norm"], dn)
        tgt = torch.zeros_like(t_q)
        inter = []
        for i in range(n_dec):
            tgt = dec_layer(params[f"decoder_layer{i}"], tgt, mem)
            inter.append(dn(tgt))
        t_hs = torch.stack(inter).transpose(1, 2).numpy()  # (L, B, Q, C)
        t_mem = mem.transpose(0, 1).reshape(b, h, w, D).numpy()

    np.testing.assert_allclose(hs, t_hs, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(memory, t_mem, rtol=1e-3, atol=1e-4)
