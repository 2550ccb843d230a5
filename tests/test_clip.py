"""CLIP tower parity vs HuggingFace CLIPModel (quick_gelu config) with
randomly initialized weights converted into our flax modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.models.clip.model import (
    CLIPTextEncoder,
    CLIPVisionTransformer,
    resize_pos_embed,
)

torch = pytest.importorskip("torch")

WIDTH, HEADS, LAYERS = 64, 4, 2
EMBED, VOCAB, CTX = 32, 100, 16
PATCH, IMG = 8, 32


def _hf_models():
    from transformers import CLIPTextModelWithProjection, CLIPVisionModelWithProjection
    from transformers import CLIPTextConfig, CLIPVisionConfig

    tcfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=WIDTH, intermediate_size=WIDTH * 4,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=CTX, hidden_act="quick_gelu",
        projection_dim=EMBED, eos_token_id=VOCAB - 1,
    )
    vcfg = CLIPVisionConfig(
        hidden_size=WIDTH, intermediate_size=WIDTH * 4,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        image_size=IMG, patch_size=PATCH, hidden_act="quick_gelu",
        projection_dim=EMBED,
    )
    torch.manual_seed(0)
    return (
        CLIPTextModelWithProjection(tcfg).eval(),
        CLIPVisionModelWithProjection(vcfg).eval(),
    )


def _t(x):
    return np.asarray(x.detach().numpy())


def _block_params(hf_layer):
    return {
        "ln_1": {"ln": {"scale": _t(hf_layer.layer_norm1.weight),
                        "bias": _t(hf_layer.layer_norm1.bias)}},
        "ln_2": {"ln": {"scale": _t(hf_layer.layer_norm2.weight),
                        "bias": _t(hf_layer.layer_norm2.bias)}},
        "attn": {
            "q_proj": {"kernel": _t(hf_layer.self_attn.q_proj.weight).T,
                       "bias": _t(hf_layer.self_attn.q_proj.bias)},
            "k_proj": {"kernel": _t(hf_layer.self_attn.k_proj.weight).T,
                       "bias": _t(hf_layer.self_attn.k_proj.bias)},
            "v_proj": {"kernel": _t(hf_layer.self_attn.v_proj.weight).T,
                       "bias": _t(hf_layer.self_attn.v_proj.bias)},
            "out_proj": {"kernel": _t(hf_layer.self_attn.out_proj.weight).T,
                         "bias": _t(hf_layer.self_attn.out_proj.bias)},
        },
        "mlp_c_fc": {"kernel": _t(hf_layer.mlp.fc1.weight).T,
                     "bias": _t(hf_layer.mlp.fc1.bias)},
        "mlp_c_proj": {"kernel": _t(hf_layer.mlp.fc2.weight).T,
                       "bias": _t(hf_layer.mlp.fc2.bias)},
    }


def test_text_encoder_parity():
    hf_text, _ = _hf_models()
    tm = hf_text.text_model

    params = {
        "token_embedding": {"embedding": _t(tm.embeddings.token_embedding.weight)},
        "positional_embedding": _t(tm.embeddings.position_embedding.weight),
        "ln_final": {"ln": {"scale": _t(tm.final_layer_norm.weight),
                            "bias": _t(tm.final_layer_norm.bias)}},
        "text_projection": _t(hf_text.text_projection.weight).T,
    }
    for i, layer in enumerate(tm.encoder.layers):
        params[f"resblock{i}"] = _block_params(layer)

    rng = np.random.RandomState(0)
    tokens = rng.randint(1, VOCAB - 1, (3, CTX)).astype(np.int64)
    tokens[:, 0] = 0
    tokens[:, -1] = VOCAB - 1  # EOT = highest id at the last position

    model = CLIPTextEncoder(
        vocab_size=VOCAB, context_length=CTX, width=WIDTH, heads=HEADS,
        layers=LAYERS, embed_dim=EMBED,
    )
    ours = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))

    with torch.no_grad():
        ref = hf_text(input_ids=torch.from_numpy(tokens)).text_embeds.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_vision_encoder_parity():
    _, hf_vis = _hf_models()
    vm = hf_vis.vision_model

    params = {
        "conv1": {"kernel": _t(vm.embeddings.patch_embedding.weight).transpose(2, 3, 1, 0)},
        "class_embedding": _t(vm.embeddings.class_embedding),
        "positional_embedding": _t(vm.embeddings.position_embedding.weight),
        "ln_pre": {"ln": {"scale": _t(vm.pre_layrnorm.weight),
                          "bias": _t(vm.pre_layrnorm.bias)}},
        "ln_post": {"ln": {"scale": _t(vm.post_layernorm.weight),
                           "bias": _t(vm.post_layernorm.bias)}},
        "proj": _t(hf_vis.visual_projection.weight).T,
    }
    for i, layer in enumerate(vm.encoder.layers):
        params[f"resblock{i}"] = _block_params(layer)

    rng = np.random.RandomState(1)
    imgs = rng.randn(2, IMG, IMG, 3).astype(np.float32)

    model = CLIPVisionTransformer(
        patch_size=PATCH, width=WIDTH, layers=LAYERS, heads=HEADS,
        embed_dim=EMBED, image_size=IMG,
    )
    ours = model.apply({"params": params}, jnp.asarray(imgs))

    with torch.no_grad():
        ref = hf_vis(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_resize_pos_embed_identity():
    pos = jnp.asarray(np.random.RandomState(0).randn(1 + 4 * 4, 8), jnp.float32)
    out = resize_pos_embed(pos, (4, 4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pos))
    out2 = resize_pos_embed(pos, (8, 6))
    assert out2.shape == (1 + 48, 8)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(pos[0]))
