"""Pallas TPU kernels for the hot ops.

Kernels here exist where XLA's default lowering leaves real performance on
the table for this model family (small-channel convolutions at high
resolution, where NHWC lane padding wastes most of the MXU and HBM
bandwidth — see ops/pallas/conv_fused.py).
"""

from mimo_unet_tpu.ops.pallas.conv_fused import fused_conv3x3_cmajor
from mimo_unet_tpu.ops.pallas.pad import reflect_pad_hw1, reflect_pad_w1

__all__ = ["fused_conv3x3_cmajor", "reflect_pad_hw1", "reflect_pad_w1"]
