"""Probe pl.Element padding semantics: what lands in the block for
offsets that reach out of bounds, and how the index_map offset is
interpreted when padding=(lo, hi) is set."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "tpu" not in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "tpu" not in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "tpu" not in sys.argv[1:]

H, W = 8, 128
TH = 4
PAD = 2


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def run(offset_fn):
    x = (jnp.arange(H, dtype=jnp.float32)[:, None]
         * jnp.ones((1, W))).reshape(1, H * W)
    out = pl.pallas_call(
        kernel,
        grid=(H // TH,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element((TH + 2 * PAD) * W,
                                           padding=(PAD * W, PAD * W))),
                offset_fn,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, (TH + 2 * PAD) * W), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, (H // TH) * (TH + 2 * PAD) * W),
                                       jnp.float32),
        interpret=INTERPRET,
    )(x)
    return out.reshape(H // TH, TH + 2 * PAD, W)[:, :, 0]


for name, fn in [
    ("offset = i*TH*W - PAD*W (pre-shifted)",
     lambda i: (0, i * TH * W - PAD * W)),
    ("offset = i*TH*W (unshifted)", lambda i: (0, i * TH * W)),
]:
    try:
        r = run(fn)
        print(name, "->")
        print(r)
    except Exception as e:
        print(name, "ERROR:", str(e).split(chr(10))[0][:200])
