"""CLIP text tower parity vs HuggingFace ``transformers`` CLIPTextModel.

The tokenizer already has HF parity (tests/test_tokenizer.py); this pins the
TEXT ENCODER numerics end-to-end: a tiny random HF
``CLIPTextModelWithProjection`` (quick_gelu, causal mask, EOT pooling,
text_projection) is converted into our ``CLIPTextEncoder`` param tree and
the outputs must match.  Catches silent drift in LayerNorm epsilon/order,
QKV conventions, causal masking, pooling index, and projection orientation —
exactly the bugs that would break zero-shot transfer from real OpenAI
checkpoints (which cannot be downloaded in this container).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from openvis_tpu.models.clip.model import CLIPTextEncoder

V, L, W, H, E, CTX = 64, 2, 32, 4, 16, 12


def _t2n(p):
    return np.asarray(p.detach().numpy(), np.float32)


def _convert_hf_text(hf) -> dict:
    """HF CLIPTextModelWithProjection state -> our CLIPTextEncoder params."""
    tm = hf.text_model
    params = {
        "token_embedding": {
            "embedding": _t2n(tm.embeddings.token_embedding.weight)
        },
        "positional_embedding": _t2n(tm.embeddings.position_embedding.weight),
        "ln_final": {"ln": {
            "scale": _t2n(tm.final_layer_norm.weight),
            "bias": _t2n(tm.final_layer_norm.bias),
        }},
        "text_projection": _t2n(hf.text_projection.weight).T,
    }
    for i, layer in enumerate(tm.encoder.layers):
        attn = {}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin = getattr(layer.self_attn, name)
            attn[name] = {"kernel": _t2n(lin.weight).T,
                          "bias": _t2n(lin.bias)}
        params[f"resblock{i}"] = {
            "attn": attn,
            "ln_1": {"ln": {"scale": _t2n(layer.layer_norm1.weight),
                            "bias": _t2n(layer.layer_norm1.bias)}},
            "ln_2": {"ln": {"scale": _t2n(layer.layer_norm2.weight),
                            "bias": _t2n(layer.layer_norm2.bias)}},
            "mlp_c_fc": {"kernel": _t2n(layer.mlp.fc1.weight).T,
                         "bias": _t2n(layer.mlp.fc1.bias)},
            "mlp_c_proj": {"kernel": _t2n(layer.mlp.fc2.weight).T,
                           "bias": _t2n(layer.mlp.fc2.bias)},
        }
    return params


def _convert_hf_vision(hf) -> dict:
    vm = hf.vision_model
    # HF conv: (width, 3, P, P) -> flax HWIO (P, P, 3, width)
    k = _t2n(vm.embeddings.patch_embedding.weight).transpose(2, 3, 1, 0)
    params = {
        "conv1": {"kernel": k},
        "class_embedding": _t2n(vm.embeddings.class_embedding),
        "positional_embedding": _t2n(vm.embeddings.position_embedding.weight),
        "ln_pre": {"ln": {"scale": _t2n(vm.pre_layrnorm.weight),
                          "bias": _t2n(vm.pre_layrnorm.bias)}},
        "ln_post": {"ln": {"scale": _t2n(vm.post_layernorm.weight),
                           "bias": _t2n(vm.post_layernorm.bias)}},
        "proj": _t2n(hf.visual_projection.weight).T,
    }
    for i, layer in enumerate(vm.encoder.layers):
        attn = {}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin = getattr(layer.self_attn, name)
            attn[name] = {"kernel": _t2n(lin.weight).T,
                          "bias": _t2n(lin.bias)}
        params[f"resblock{i}"] = {
            "attn": attn,
            "ln_1": {"ln": {"scale": _t2n(layer.layer_norm1.weight),
                            "bias": _t2n(layer.layer_norm1.bias)}},
            "ln_2": {"ln": {"scale": _t2n(layer.layer_norm2.weight),
                            "bias": _t2n(layer.layer_norm2.bias)}},
            "mlp_c_fc": {"kernel": _t2n(layer.mlp.fc1.weight).T,
                         "bias": _t2n(layer.mlp.fc1.bias)},
            "mlp_c_proj": {"kernel": _t2n(layer.mlp.fc2.weight).T,
                           "bias": _t2n(layer.mlp.fc2.bias)},
        }
    return params


def test_vision_tower_matches_hf():
    from openvis_tpu.models.clip.model import CLIPVisionTransformer

    patch, img = 8, 32
    cfg = transformers.CLIPVisionConfig(
        hidden_size=W, intermediate_size=4 * W, num_hidden_layers=L,
        num_attention_heads=H, image_size=img, patch_size=patch,
        hidden_act="quick_gelu", projection_dim=E, layer_norm_eps=1e-5,
    )
    torch.manual_seed(2)
    hf = transformers.CLIPVisionModelWithProjection(cfg).eval()

    rng = np.random.RandomState(3)
    imgs = rng.randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(
            imgs.transpose(0, 3, 1, 2)
        ))
    theirs = out.image_embeds.numpy()

    vit = CLIPVisionTransformer(
        patch_size=patch, width=W, layers=L, heads=H, embed_dim=E,
        image_size=img,
    )
    ours = np.asarray(
        vit.apply({"params": _convert_hf_vision(hf)}, jnp.asarray(imgs))
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_text_tower_matches_hf():
    cfg = transformers.CLIPTextConfig(
        vocab_size=V, hidden_size=W, intermediate_size=4 * W,
        num_hidden_layers=L, num_attention_heads=H,
        max_position_embeddings=CTX, hidden_act="quick_gelu",
        projection_dim=E, eos_token_id=V - 1, bos_token_id=V - 2,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(cfg).eval()

    rng = np.random.RandomState(1)
    # tokens end with the EOS id (= the max id), so HF's eos-position pooling
    # and our argmax pooling agree by construction
    ids = rng.randint(0, V - 2, (3, CTX)).astype(np.int64)
    ids[:, -1] = V - 1

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids))
    theirs = out.text_embeds.numpy()

    enc = CLIPTextEncoder(
        vocab_size=V, context_length=CTX, width=W, heads=H, layers=L,
        embed_dim=E,
    )
    params = _convert_hf_text(hf)
    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(ids.astype(np.int32)))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
