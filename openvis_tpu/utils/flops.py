"""Analytic FLOP accounting + XLA-counted totals for the perf harness.

The reference publishes no FLOPs (a FLOPs hook exists only commented out,
``ops/modules/ms_deform_attn.py:122-123``); MFU is the only absolute perf
yardstick available in-container (BASELINE.md).  Two complementary counts:

  * :func:`xla_cost_flops` — the XLA compiler's own flop count of a jitted
    function (CPU backend; the MSDA op takes its XLA-composition path there,
    so the count is the *useful*-work count, not the Pallas implicit-matmul
    inflation).  Exact w.r.t. what the graph computes; used as the MFU
    numerator.
  * analytic per-component formulas (backbone / encoder / decoder / heads /
    CLIP) — dominant matmul+conv terms only, for the roofline breakdown
    table.  These deliberately ignore norms, softmaxes, and elementwise ops
    (<1% of FLOPs, though not of runtime).

MSDA gets two analytic numbers: ``useful`` (4-corner bilinear + weighted
reduce per sampled point — what the reference CUDA kernel executes per
sample, ``ms_deform_im2col_cuda.cuh:243``) and ``implicit_matmul_bound`` (the
Pallas kernel's MXU work if every program walked its full level height —
the kernel's row-interval gating makes the true count data-dependent and
strictly smaller; see ops/msda_pallas.py).  MFU uses ``useful``.

Flop convention: 1 multiply-add = 2 FLOPs.
"""

from __future__ import annotations

from typing import Dict, Tuple

# v5e peak dense bf16 throughput per chip (Google Cloud TPU v5e spec:
# 394 TOPS int8 / 197 TFLOPs bf16).
V5E_BF16_PEAK = 197e12


# ---------------------------------------------------------------- backbone

_R50_STAGES = (
    # (n_blocks, c_mid, c_out, stride-of-stage)
    (3, 64, 256, 1),    # res2 (after the /4 stem+pool)
    (4, 128, 512, 2),   # res3
    (6, 256, 1024, 2),  # res4
    (3, 512, 2048, 2),  # res5
)


def resnet50_flops(h: int, w: int) -> float:
    """Per-frame ResNet-50 forward FLOPs at input (h, w) (d2
    ``build_resnet_backbone`` topology, stride_in_1x1=False)."""
    total = 2.0 * (h // 2) * (w // 2) * 3 * 64 * 49          # stem 7x7/2
    hin, win, cin = h // 4, w // 4, 64                       # after maxpool
    for n, cmid, cout, s in _R50_STAGES:
        ho, wo = hin // s, win // s
        # first block (with projection shortcut + stride on the 3x3)
        total += 2.0 * hin * win * cin * cmid                # conv1 1x1
        total += 2.0 * ho * wo * cmid * cmid * 9             # conv2 3x3/s
        total += 2.0 * ho * wo * cmid * cout                 # conv3 1x1
        total += 2.0 * ho * wo * cin * cout                  # shortcut
        for _ in range(n - 1):
            total += 2.0 * ho * wo * cout * cmid
            total += 2.0 * ho * wo * cmid * cmid * 9
            total += 2.0 * ho * wo * cmid * cout
        hin, win, cin = ho, wo, cout
    return total


# ------------------------------------------------------------- pixel decoder

def _level_tokens(h: int, w: int) -> Tuple[int, ...]:
    """Token counts of the 3 encoder levels (1/8, 1/16, 1/32)."""
    return tuple((h // s) * (w // s) for s in (8, 16, 32))


def msda_layer_flops(
    h: int, w: int, dim: int = 256, heads: int = 8, points: int = 4,
    ffn_dim: int = 1024,
) -> Dict[str, float]:
    """Per-frame FLOPs of ONE deformable-encoder layer
    (``msdeformattn.py:107-146``): projections + offset/weight MLPs + FFN
    (exact matmul counts) and the sampling itself (useful vs the Pallas
    implicit-matmul upper bound)."""
    lv = _level_tokens(h, w)
    lt = sum(lv)                       # queries = all level tokens
    nl = len(lv)
    ch = dim // heads
    proj = 2.0 * lt * dim * dim * 2                      # value + output proj
    offs = 2.0 * lt * dim * (heads * nl * points * 3)    # offsets(2) + weights(1)
    ffn = 2.0 * lt * dim * ffn_dim * 2
    # useful sampling work: 4-corner bilinear (4 MACs) + weight reduce (1 MAC)
    # per (query, head, level, point, channel)
    useful = 2.0 * lt * heads * nl * points * ch * 5
    # Pallas implicit-matmul bound: every program visits every row block of
    # every level -> programs(lt/bq) * sum_l ceil(hp_l/rr) blocks, each doing
    # a (P*BQ, wp) @ (wp, rr*ch) dot per head-group; with the kernel's
    # P=heads*points tent stacking the per-block dot is
    # (heads*points*BQ, wp_l) @ (wp_l, rr*ch).
    bq, rr = 80, 4
    bound = 0.0
    for (hl, wl) in [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]:
        wp = ((wl + 127) // 128) * 128
        pk = max(1, 128 // wl) if wl <= 64 else 1        # row packing
        hp = (hl + pk - 1) // pk
        nblocks = (hp + rr - 1) // rr
        progs = (lt + bq - 1) // bq
        bound += 2.0 * progs * nblocks * (heads * points * bq) * wp * rr * ch
    return {"proj": proj + offs, "ffn": ffn, "sample_useful": useful,
            "sample_implicit_bound": bound}


def pixel_decoder_flops(h: int, w: int, dim: int = 256,
                        enc_layers: int = 6) -> Dict[str, float]:
    """Per-frame: input 1x1 projections, 6 MSDA layers, FPN tail + mask
    feature head (``pixel_decoder.py``)."""
    lv = _level_tokens(h, w)
    per = msda_layer_flops(h, w, dim=dim)
    msda_fixed = enc_layers * (per["proj"] + per["ffn"])
    inputs = 2.0 * (lv[0] * 512 + lv[1] * 1024 + lv[2] * 2048) * dim
    l4 = (h // 4) * (w // 4)
    fpn = 2.0 * l4 * 256 * dim + 2.0 * l4 * dim * dim * 9   # lateral + output
    maskf = 2.0 * l4 * dim * dim                            # mask_features 1x1
    return {
        "fixed": inputs + msda_fixed + fpn + maskf,
        "sample_useful": enc_layers * per["sample_useful"],
        "sample_implicit_bound": enc_layers * per["sample_implicit_bound"],
    }


# ----------------------------------------------------------------- decoder

def frame_decoder_flops(
    h: int, w: int, q: int = 100, dim: int = 256, layers: int = 9,
    ffn_dim: int = 2048, embed_dim: int = 512,
) -> float:
    """Per-frame Mask2Former frame decoder: 9 layers round-robin over the 3
    scales (masked cross-attn + self-attn + FFN), per-layer mask-embed MLP +
    mask einsum over the 1/4 mask features, class/embedding head
    (``frame_mask2former_transformer_decoder.py``)."""
    lv = _level_tokens(h, w)
    l4 = (h // 4) * (w // 4)
    total = 0.0
    for i in range(layers):
        lk = lv[i % 3]
        # cross-attn: q/k/v/out projections + logits + values
        total += 2.0 * (q + 2 * lk) * dim * dim + 2.0 * q * dim * dim
        total += 2.0 * q * lk * dim * 2
        # self-attn
        total += 2.0 * 4 * q * dim * dim + 2.0 * q * q * dim * 2
        total += 2.0 * q * dim * ffn_dim * 2
    # heads run layers+1 times (initial-query prediction included)
    heads = (layers + 1) * (
        3 * 2.0 * q * dim * dim        # mask-embed MLP
        + 2.0 * q * l4 * dim           # mask einsum
        + 2.0 * q * dim * embed_dim    # class/clip-embed head
    )
    return total + heads


# -------------------------------------------------------------------- CLIP

def clip_vit_flops(n_tokens: int, width: int, layers: int,
                   ffn_mult: int = 4) -> float:
    """Transformer-only FLOPs of a CLIP ViT run over ``n_tokens`` tokens."""
    per_layer = (
        2.0 * 4 * n_tokens * width * width            # qkv + out proj
        + 2.0 * n_tokens * n_tokens * width * 2       # logits + values
        + 2.0 * n_tokens * width * (ffn_mult * width) * 2
    )
    return layers * per_layer


def san_clip_flops(q: int = 100, grid: int = 14, width: int = 768,
                   broken: int = 9, layers: int = 12) -> Dict[str, float]:
    """Per-frame SAN CLIP cost: front blocks over 1+L tokens, post blocks
    over the sos-split structure (ctx self-attn + Q sos cross rows)."""
    l1 = 1 + grid * grid
    front = clip_vit_flops(l1, width, broken) + 2.0 * grid * grid * 3 * width * 16 * 16
    npost = layers - broken
    ctx = clip_vit_flops(l1, width, npost)
    sos = npost * (
        2.0 * 4 * q * width * width
        + 2.0 * q * (1 + l1) * width * 2
        + 2.0 * q * width * 4 * width * 2
    )
    return {"front": front, "post": ctx + sos}


# ------------------------------------------------------------------ totals

def simplebsl_eval_flops(t: int, h: int, w: int) -> Dict[str, float]:
    """Analytic per-window breakdown for the SimpleBSLOnline eval bench
    shapes; MFU uses the XLA-counted totals (tools/flops_count.py), this is
    the roofline table."""
    pd = pixel_decoder_flops(h, w)
    comps = {
        "backbone": t * resnet50_flops(h, w),
        "pixel_decoder_fixed": t * pd["fixed"],
        "msda_useful": t * pd["sample_useful"],
        "msda_implicit_bound": t * pd["sample_implicit_bound"],
        "decoder_heads": t * frame_decoder_flops(h, w),
    }
    comps["total_useful"] = (
        comps["backbone"] + comps["pixel_decoder_fixed"]
        + comps["msda_useful"] + comps["decoder_heads"]
    )
    return comps


def san_eval_flops(t: int, h: int, w: int) -> Dict[str, float]:
    base = simplebsl_eval_flops(t, h, w)
    clip = san_clip_flops()
    base["clip_front"] = t * clip["front"]
    base["clip_post"] = t * clip["post"]
    base["total_useful"] += base["clip_front"] + base["clip_post"]
    return base


def xla_cost_flops(fn, *args, **kwargs) -> float:
    """FLOPs of ``jit(fn)(*args)`` as counted by the XLA compiler.

    Must run on the CPU backend (``jax.config.update('jax_platforms',
    'cpu')``) so the MSDA op lowers through its XLA composition; the count
    is then the useful-work count.  Compile-only — nothing executes."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", -1.0))
    if flops <= 0:
        raise RuntimeError(f"XLA cost analysis returned no flops: {ca}")
    return flops
