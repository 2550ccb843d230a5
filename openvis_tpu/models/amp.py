"""AMP dtype policy helpers — torch.cuda.amp.autocast semantics on TPU.

Under autocast (reference ``train_net.py:241-242`` wraps both train and eval
forwards), torch runs matmuls/convs in bf16 but pins normalization and
softmax arithmetic to fp32; the fp32 result is then cast back down by the
next bf16 op's input cast.  The JAX analog needs the downcast to be
EXPLICIT: flax norms with f32 scale/bias PROMOTE a bf16 input to f32 and
return f32, so without a cast-back every tensor downstream of the first
norm silently runs f32 — measured on v5e-1 as the whole "bf16 AMP" train
forward/backward actually executing in f32 (434/436 captured intermediates
f32; composed model fwd+bwd 356 ms vs 187 ms genuinely-bf16).

``amp_norm(mod, x)`` = fp32 norm arithmetic + cast back to ``x.dtype``:
bitwise what autocast gives the next matmul (torch hands it the f32 norm
output, then casts it to bf16 at the matmul input — same rounding point).

``softmax_f32`` mirrors autocast's fp32 softmax list entry for attention
weights computed from bf16 logits.

Both are identity for f32 inputs, so the non-AMP (f32) golden-trace parity
suites are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def amp_norm(mod, x: jax.Array) -> jax.Array:
    """Apply a flax norm module with fp32 arithmetic, cast back to x.dtype."""
    return mod(x.astype(jnp.float32)).astype(x.dtype)


def softmax_f32(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax computed in fp32 (autocast policy), result in logits.dtype."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis).astype(
        logits.dtype
    )
