"""Fused channel-major 3x3 convolution (+affine +ReLU) Pallas kernel.

Why: the U-Net's hot convolutions have tiny channel counts (21-84) at high
resolution (reference fbc=21 => decoder DoubleConv runs 63->31->21 at
256x256).  In NHWC, channels sit in the TPU lane dimension, so C=31 uses
31/128 lanes of every HBM tile and every MXU pass — the single largest
inefficiency in the whole network (~25ms for one such conv at B=256).

This kernel uses a channel-major activation layout [B, C, H, W]: W rides
the lanes (multiples of 128 at these resolutions — zero padding waste) and
C rides sublanes.  The 3x3 conv becomes 9 tap matmuls contracting C,
accumulated in a VMEM f32 scratch (no HBM accumulator round-trips, which is
what sank the pure-XLA tap-sum formulation), with the BatchNorm affine and
ReLU fused into the epilogue.

Layout contract:
  x:     [B, C, H, W]   spatially pre-padded by 1 (H, W include the halo)
  w:     [3, 3, C, O]   (HWIO like the rest of the framework)
  scale: [O]            fused per-channel affine (1.0 / BN inv-sigma*gamma)
  shift: [O]            (0.0 / BN beta - mean*scale); conv bias folds in
  out:   [B, O, H-2, W-2]

Grid: (B, H_tiles).  Each step DMAs an H-slab with its 2-row halo; halos
overlap between steps, which BlockSpec can't express, so the input stays in
ANY/HBM memory space and the slab copy is a manual DMA.

STATUS: numerically verified in interpret mode (tests/test_pallas.py); on
the current axon single-chip testbed the manual halo DMA crashes the remote
compile helper, so the kernel is NOT wired into the model path yet — the
production path keeps XLA convs fed by the cheap selection-matrix reflect
pad (ops/conv.py reflect_pad1; measurements in docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, xs, acc, sem,
            *, th: int, relu: bool, out_dtype):
    """One grid step: rows [i*th, i*th + th) of image b."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = x_hbm.shape[1]
    w_in = x_hbm.shape[3]
    w_out = w_in - 2

    # DMA the H slab (with halo) for this tile: [C, th+2, W]
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * th, th + 2), :], xs, sem
    )
    copy.start()
    copy.wait()

    # accumulate 9 tap matmuls into f32 scratch [O, th, W-2]
    acc[...] = jnp.zeros_like(acc)
    for dy in range(3):
        for dx in range(3):
            x_tap = xs[:, dy : dy + th, dx : dx + w_out]  # [C, th, W-2]
            w_tap = w_ref[dy, dx]  # [C, O]
            # contract C: [C,O]^T x [C, th, W-2] -> [O, th, W-2]
            acc[...] += jax.lax.dot_general(
                w_tap, x_tap,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    y = acc[...] * scale_ref[:][:, None, None] + shift_ref[:][:, None, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_h", "interpret")
)
def fused_conv3x3_cmajor(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    relu: bool = True,
    tile_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """x [B, C, H+2, W+2] (pre-padded) -> [B, O, H, W].

    ``scale``/``shift`` fold conv bias and (eval-mode) BatchNorm:
      y = relu(conv(x, w) * scale + shift).
    """
    b, c, hp, wp = x.shape
    o = w.shape[3]
    h, w_out = hp - 2, wp - 2
    th = min(tile_h, h)
    assert h % th == 0, f"H={h} must divide tile_h={th}"

    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, relu=relu, out_dtype=x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift
        ],
        out_specs=pl.BlockSpec(
            (1, o, th, w_out), lambda bi, hi: (bi, 0, hi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, o, h, w_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, th + 2, wp), x.dtype),
            pltpu.VMEM((o, th, w_out), f32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w.astype(x.dtype), scale.astype(f32), shift.astype(f32))
    return out
