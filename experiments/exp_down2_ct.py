"""down2 via the CT kernel with two images packed per 128-lane row.

The core's w=64 stages were CT-ineligible because dy shifts (w lanes)
must be 128-aligned.  Packing k=128/w images per lane row fixes that:
each 128-lane row holds row r of k images, dy shifts become one full
lane block, and only the dx-combine's reflect-edge masks need the true
image width (w_img).  This measures the whole production segment both
ways at the flagship shape (B=128):

  XLA: pooled CT -> NHWC transpose -> double_conv_apply -> NHWC (down3)
  CT : pooled CT -> pair-pack transpose -> fused kernel (w=128,
       w_img=64) -> NHWC transpose

and checks numerics against the XLA block.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.blocks import double_conv_apply
from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig, mimo_unet_init
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8, fold_bn_eval, fused_double_conv_ct, pack_w3x3, pick_th)


def timed(fn, *args, reps=20):
    r = fn(*args)
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    b, s, f = 128, 2, 21
    hw = 64  # down2 resolution
    f2, fs = 2 * f, f * s
    f2a = align8(f2)
    k = 128 // hw
    cfg = MimoUNetConfig(in_channels=3, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    d2p, d2s = params["core"]["down2"], state["core"]["down2"]
    cdt = jnp.bfloat16
    c_in = 2 * fs      # 84
    rows = s * f2a     # grouped-rows CT channel count (96)
    m = d2p["conv1"]["w"].shape[-1]   # 4fs = 168
    o = d2p["conv2"]["w"].shape[-1]   # 168

    pooled = jax.random.normal(jax.random.key(1),
                               (rows, b * hw * hw)).astype(cdt)
    pooled = pooled.reshape(s, f2a, -1).at[:, f2:].set(0.0).reshape(rows, -1)

    def to_nhwc(xct):
        t = jnp.transpose(xct.reshape(s, f2a, b, hw, hw), (2, 3, 4, 0, 1))
        return t[..., :f2].reshape(b, hw, hw, s * f2)

    def xla_seg(xct):
        y, _ = double_conv_apply(d2p, d2s, to_nhwc(xct), train=False,
                                 compute_dtype=cdt)
        return y  # [b, hw, hw, o] NHWC

    # ---- CT segment --------------------------------------------------------
    s1, sh1 = fold_bn_eval(d2p["conv1"]["b"], d2p["bn1"], d2s["bn1"])
    s2, sh2 = fold_bn_eval(d2p["conv2"]["b"], d2p["bn2"], d2s["bn2"])
    w1 = d2p["conv1"]["w"]  # [3, 3, 84, 168], input order s-major
    wide = jnp.zeros((3, 3, rows, m), w1.dtype)
    for g in range(s):
        wide = wide.at[:, :, g * f2a:g * f2a + f2].set(
            w1[:, :, g * f2:(g + 1) * f2])
    w1p = pack_w3x3([wide])[None]
    w2p = pack_w3x3([d2p["conv2"]["w"]])[None]
    th = pick_th(hw, k * hw, rows, 0, m, o, align8(o))
    print("th =", th)

    def ct_seg(xct):
        xp = xct.reshape(rows, b // k, k, hw, hw)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4)).reshape(rows, -1)
        y = fused_double_conv_ct(
            xp, w1p, s1[None], sh1[None], w2p, s2[None], sh2[None],
            h=hw, w=k * hw, w_img=hw, th=th, c1=rows, m=m, o=o)
        y5 = y[:o].reshape(o, b // k, hw, k, hw)
        return jnp.transpose(y5, (1, 3, 2, 4, 0)).reshape(b, hw, hw, o)

    fx = jax.jit(xla_seg)
    fc = jax.jit(ct_seg)
    yx = fx(pooled)
    yc = fc(pooled)
    a = yx.astype(jnp.float32).reshape(-1)
    c = yc.astype(jnp.float32).reshape(-1)
    scale = float(jnp.max(jnp.abs(a)))
    err = float(jnp.max(jnp.abs(a - c))) / scale
    print(f"relerr {err:.2e}")
    print(f"XLA down2 segment: {timed(fx, pooled)*1e3:.2f} ms")
    print(f"CT  down2 segment: {timed(fc, pooled)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
