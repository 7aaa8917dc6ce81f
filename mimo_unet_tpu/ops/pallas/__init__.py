"""Pallas TPU kernels for the hot ops (production CT kernel layer).

Kernels here exist where XLA's default lowering leaves real performance on
the table for this model family: small-channel convolutions at high
resolution, where NHWC lane padding wastes most of the MXU and HBM
bandwidth. Activations ride the channel-transposed (CT) [C, N*H*W]
layout — see ops/pallas/ct_conv.py (fused eval DoubleConv), ct_train.py
(train convs with custom VJP + BatchNorm statistics), ct_elem.py
(group-blocked elementwise passes).

Superseded round-1 prototypes (NHWC fused conv, standalone reflect-pad
kernels) live in experiments/pallas_*.py; their findings are recorded in
docs/PERFORMANCE.md.
"""

from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8,
    fold_bn_eval,
    fused_double_conv_ct,
    pack_w3x3,
    pick_th,
)
from mimo_unet_tpu.ops.pallas.ct_elem import (
    affine_relu_ct,
    conv1x1_ct,
    g_eff_ct,
)
from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train

__all__ = [
    "align8",
    "fold_bn_eval",
    "fused_double_conv_ct",
    "pack_w3x3",
    "pick_th",
    "affine_relu_ct",
    "conv1x1_ct",
    "g_eff_ct",
    "conv3x3_ct_train",
]
