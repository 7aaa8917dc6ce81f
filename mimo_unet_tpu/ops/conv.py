"""2D convolutions in NHWC layout for TPU.

The reference U-Net blocks (reference: mimo/models/mimo_components/
components.py:23-28) use 3x3 convs with reflect padding and 1x1 output
convs; the non-bilinear ``Up`` variant uses a 2x2 stride-2 transposed conv
(components.py:96-99).  Here they are expressed as
``lax.conv_general_dilated`` over NHWC/HWIO, the layouts the TPU MXU wants.

Weights are stored HWIO: ``[kh, kw, in_channels // groups, out_channels]``.
Initialization matches ``torch.nn.Conv2d.reset_parameters`` (kaiming-uniform
with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias) so parameter statistics are comparable with the reference.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO weights, NHWC outputs.
_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d_init(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    groups: int = 1,
    dtype=jnp.float32,
) -> dict:
    """Initialize conv weights: U(-b, b) with b = 1/sqrt(fan_in), torch style."""
    if in_channels % groups or out_channels % groups:
        raise ValueError("in/out channels must be divisible by groups")
    k_w, k_b = jax.random.split(key)
    fan_in = (in_channels // groups) * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        k_w,
        (kernel_size, kernel_size, in_channels // groups, out_channels),
        dtype,
        -bound,
        bound,
    )
    b = jax.random.uniform(k_b, (out_channels,), dtype, -bound, bound)
    return {"w": w, "b": b}


def conv2d(
    x: jax.Array,
    params: dict,
    *,
    stride: int = 1,
    padding: str | int = 0,
    groups: int = 1,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """NHWC conv. ``padding``: int (zero pad), "SAME", "VALID" or "REFLECT".

    "REFLECT" applies torch's ``padding_mode="reflect"`` with pad = (k-1)//2
    (the DoubleConv 3x3 configuration) before a VALID conv.

    ``compute_dtype`` casts inputs and weights (e.g. to bfloat16) and the
    output *stays* in that dtype — the TPU mixed-precision recipe: bf16
    activations end-to-end (the MXU accumulates in f32 in hardware), f32
    master weights, f32 upcast only at normalization/loss boundaries.
    (``preferred_element_type`` upcasting is avoided: jax 0.9's conv
    transpose rule mismatches dtypes when differentiating through it.)
    """
    w, b = params["w"], params["b"]
    kh, kw = w.shape[0], w.shape[1]

    if padding == "REFLECT":
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
        pad_cfg = "VALID"
    elif isinstance(padding, int):
        pad_cfg = [(padding, padding), (padding, padding)]
    else:
        pad_cfg = padding

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    elif x.dtype != w.dtype:
        w = w.astype(x.dtype)

    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad_cfg,
        dimension_numbers=_DIMENSION_NUMBERS,
        feature_group_count=groups,
    )
    return y + b.astype(y.dtype)


def conv_transpose2d_init(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    groups: int = 1,
    dtype=jnp.float32,
) -> dict:
    """torch ConvTranspose2d init: fan_in = (out_channels // groups) * k * k.

    (torch computes fan_in from weight shape [in, out//groups, k, k] whose
    dim-1 * receptive field is out//groups * k * k.)
    """
    k_w, k_b = jax.random.split(key)
    fan_in = (out_channels // groups) * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    # Stored HWIO for the equivalent forward conv on the dilated input:
    # [kh, kw, in_channels // groups, out_channels].
    w = jax.random.uniform(
        k_w,
        (kernel_size, kernel_size, in_channels // groups, out_channels),
        dtype,
        -bound,
        bound,
    )
    b = jax.random.uniform(k_b, (out_channels,), dtype, -bound, bound)
    return {"w": w, "b": b}


def conv_transpose2d(
    x: jax.Array,
    params: dict,
    *,
    stride: int = 2,
    groups: int = 1,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Transposed conv (kernel 2, stride 2 in the reference ``Up`` variant).

    Implemented as input-dilated convolution with a spatially-flipped kernel,
    which is exactly torch's ConvTranspose2d forward.
    """
    w, b = params["w"], params["b"]
    kh, kw = w.shape[0], w.shape[1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    elif x.dtype != w.dtype:
        w = w.astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMENSION_NUMBERS,
        feature_group_count=groups,
    )
    return y + b.astype(y.dtype)
