"""Int8 quantized serving (w8a8, dynamic per-token activation scales).

The v5e MXU runs int8×int8→int32 at ~2× its bf16 rate (measured on this
chip: 325 vs 165–173 TF/s on large gemms; a 12-layer transformer-gemm
chain at CLIP-ViP serving shapes runs 1.32× faster *in isolation*,
including the activation-quantization overhead).

**Measured verdict on v5e (PERF.md "int8 serving — measured negative"):
keep the default bf16 serving path.** Inside the full CLIP-ViP program
the isolated gain does not survive: w8a8 with dynamic per-token scales
is 28% slower at serving batch 24 and 41% slower at bulk batch 256;
static calibrated scales recover to parity at b=24 but stay 31% behind
at b=256 (quant/round/clip passes traverse the full activation tensors
through HBM between attention and gemm stages, and XLA does not run the
model's [tokens,768]-class int8 gemms anywhere near the isolated int8
rate). Accuracy, by contrast, is excellent — embedding cosine ≥0.9994
vs the fp path at B/32 production scale — so this module stays as a
validated option for memory-constrained deployments and future
hardware/XLA revisions where the MXU int8 rate materializes in-program.

Design — zero checkpoint change, framework-wide:

- :func:`int8_serving` is a context manager that installs a flax *method
  interceptor* swapping every sufficiently large ``nn.Dense``'s matmul
  for a quantized one at ``apply`` time. Params stay the fp32/bf16 trees
  every converter and checkpoint already produces.
- Weights quantize **in-jit**, symmetric per-out-channel absmax. The cost
  is O(D_in·D_out) VPU work per layer vs the O(tokens·D_in·D_out) gemm —
  negligible at serving token counts, and loop-invariant, so XLA hoists
  it out of scan-chained serving loops entirely.
- Activations quantize dynamically per token (symmetric absmax over the
  feature axis) — standard w8a8. The int32 accumulator is rescaled in
  fp32 by ``act_scale[token] · weight_scale[channel]``, then bias is
  added and the result cast back to the activation dtype.
- Attention score/PV matmuls, LayerNorms, softmaxes and embedding
  lookups stay in bf16/fp32: they carry most of the numerical
  sensitivity and (for the proxy/window kernels) live inside fused
  Pallas kernels.

The reference serves fp16 torch and has no quantized path; this is a
TPU-native serving extension. Accuracy is asserted per model family in
``tests/test_quant.py`` (embedding cosine vs the fp path).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """Symmetric per-out-channel int8 quantization of a [in, out] kernel.

    Returns ``(q, scale)`` with ``q`` int8 and ``scale`` fp32 [out] such
    that ``q * scale ≈ w``.
    """
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: Array, q: Array, w_scale: Array) -> Array:
    """``x @ (q * w_scale)`` computed as an int8×int8→int32 MXU gemm.

    ``x`` [..., in] is quantized per token (dynamic symmetric absmax over
    the feature axis); the int32 accumulator is rescaled in fp32. Output
    dtype follows ``x``.
    """
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = amax / 127.0 + 1e-12
    qx = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(
        qx, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * s * w_scale[None, :]
    return out.reshape(*lead, q.shape[1]).astype(x.dtype)


def make_int8_dense_interceptor(
    min_in_features: int = 256, min_features: int = 256
) -> Callable[..., Any]:
    """Interceptor replacing big ``nn.Dense`` calls with int8 gemms.

    Dense modules below the size thresholds (classifier heads, tiny
    configs) and any module call during ``init`` (no bound params yet)
    fall through to the normal fp path.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            not isinstance(mod, nn.Dense)
            or context.method_name != "__call__"
            or not args
        ):
            return next_fun(*args, **kwargs)
        x = args[0]
        if (
            not hasattr(x, "shape")
            or x.ndim < 1
            or x.shape[-1] < min_in_features
            or mod.features < min_features
        ):
            return next_fun(*args, **kwargs)
        variables = mod.variables.get("params", {})
        kernel = variables.get("kernel")
        if kernel is None:  # init pass — let the module create its params
            return next_fun(*args, **kwargs)
        q, w_scale = quantize_weight(kernel)
        y = int8_matmul(x, q, w_scale)
        bias = variables.get("bias")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    return interceptor


@contextlib.contextmanager
def int8_serving(min_in_features: int = 256, min_features: int = 256):
    """Context manager: run ``model.apply`` calls with int8 Dense gemms.

    Usage::

        with int8_serving():
            out = model.apply(params, video, ids, mask)

    Composable with ``jax.jit`` (enter the context around the traced
    call or inside the jitted fn — interception happens at trace time).
    """
    with nn.intercept_methods(
        make_int8_dense_interceptor(min_in_features, min_features)
    ):
        yield


def maybe_int8_serving(enabled: bool, **kw):
    """``int8_serving()`` when ``enabled`` else a null context."""
    return int8_serving(**kw) if enabled else contextlib.nullcontext()
