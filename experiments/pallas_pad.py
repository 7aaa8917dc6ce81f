"""Reflect-pad-W Pallas kernel — the hot op nobody expects.

Profiling the U-Net on TPU showed the 3x3 convolutions themselves run near
the MXU roofline; the time sink is ``jnp.pad(mode='reflect')`` on the width
axis: in NHWC, W is the sublane dimension, so inserting one column shifts
every (8/16, 128) tile — XLA lowers it as a full misaligned relayout
(~12 ms for a [256, 258, 256, 63] bf16 tensor vs the ~2.5 ms copy floor).
Padding H is a major-dim concat and already runs at copy speed.

This kernel performs the W-pad with the shifted write inside VMEM, where
sublane rotations are cheap: HBM traffic is exactly read-once/write-once.

Layout contract: x [B, H, W, C] -> out [B, H, W+2, C] with
out[..., 0, :] = x[..., 1, :] and out[..., W+1, :] = x[..., W-2, :]
(torch reflect semantics for pad=1).

STATUS: correct (interpret-verified) but measured SLOWER than the
selection-matrix matmul pad on the axon testbed (sublane-shifted stores
are expensive even inside VMEM: 46 ms vs ~5 ms for the einsum pad at
[256, 258, 256, 63]).  The production pad is ops/conv.py::reflect_pad1;
this kernel is kept as the documented alternative for hardware where
Mosaic sublane stores are cheaper.  See docs/PERFORMANCE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref):
    x = x_ref[0]  # [th, W, C]
    w = x.shape[1]
    left = x[:, 1:2, :]
    right = x[:, w - 2 : w - 1, :]
    o_ref[0] = jnp.concatenate([left, x, right], axis=1)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def reflect_pad_w1(x: jax.Array, *, tile_h: int = 8, interpret: bool = False) -> jax.Array:
    """x [B, H, W, C] -> [B, H, W+2, C], reflect pad of 1 on W (NHWC)."""
    b, h, w, c = x.shape
    if w < 2:
        raise ValueError("reflect pad needs W >= 2")
    th = tile_h
    while h % th:
        th //= 2
    th = max(th, 1)
    return pl.pallas_call(
        _kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w + 2, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w + 2, c), x.dtype),
        interpret=interpret,
    )(x)


def reflect_pad_hw1(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """x [B, H, W, C] -> [B, H+2, W+2, C] reflect pad of 1 on H and W.

    H first (major-dim concat: copy-speed under XLA), then the W kernel.
    """
    xh = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    return reflect_pad_w1(xh, interpret=interpret)
