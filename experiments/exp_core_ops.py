"""Per-op profile of the shared NHWC core (eval, B=128, flagship config).

Breaks every core block (down2..up3, reference model.py:178-243) into its
constituent ops — pool, conv1(+BN+relu), conv2(+BN+relu), upsample+pad+
concat — timing each as an isolated jit with the relay-safe differential
protocol, and reporting achieved TF/s and GB/s against v5e peaks
(~197 TF/s bf16, ~819 GB/s HBM).  This is the profile table VERDICT r2
asked for: where each millisecond goes and which ops are compute- vs
memory-bound.

Caveat (PERFORMANCE.md finding 5): isolated-jit times do not compose
exactly into the fused graph — the full-core jit is timed too and the
table is for *attribution*, not absolute accounting.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig, mimo_unet_init, core_apply
from mimo_unet_tpu.ops import batch_norm, conv2d, max_pool_2x2, upsample_bilinear_x2_align_corners
from mimo_unet_tpu.ops.conv import reflect_pad1

PEAK_TF = 197.0
PEAK_GB = 819.0


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


ROWS = []


def report(name, t, flops, bytes_):
    tf = flops / t / 1e12
    gb = bytes_ / t / 1e9
    bound = "MXU" if tf / PEAK_TF > gb / PEAK_GB else "HBM"
    attain = min(PEAK_TF, PEAK_GB * 1e9 * flops / max(bytes_, 1) / 1e12)
    ROWS.append((name, t * 1e3, tf, gb, bound, attain))
    print(f"{name:26s} {t*1e3:7.2f} ms  {tf:6.1f} TF/s  {gb:6.1f} GB/s "
          f"[{bound}-bound, attainable {attain:.0f} TF/s]", flush=True)


def conv_op(name, p, bn_p, bn_s, xin, b):
    """conv(+reflect pad)+BN(eval affine)+relu as one jit."""
    fn = jax.jit(lambda x: jnp.maximum(batch_norm(
        conv2d(x, p, padding="REFLECT", compute_dtype=jnp.bfloat16),
        bn_p, bn_s, train=False)[0], 0))
    out = fn(xin)
    hh, ww, ci = xin.shape[1], xin.shape[2], xin.shape[3]
    co = out.shape[3]
    flops = 2 * b * hh * ww * ci * co * 9
    bytes_ = (xin.size + out.size) * 2
    report(name, timed(fn, xin), flops, bytes_)
    return out


def main():
    b, s, f = 128, 2, 21
    fs = f * s
    cfg = MimoUNetConfig(in_channels=3, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    cp, cs = params["core"], state["core"]
    cdt = jnp.bfloat16
    h2 = w2 = 128

    x2_concat = jax.random.normal(
        jax.random.key(1), (b, h2, w2, 2 * fs)).astype(cdt)

    # ---------------- down blocks: pool -> conv1 -> conv2 -------------------
    skips = {"x2": x2_concat}
    xin = x2_concat
    for name in ("down2", "down3", "down4"):
        pool = jax.jit(max_pool_2x2)
        pooled = pool(xin)
        report(f"{name}.pool", timed(pool, xin), 0,
               (xin.size + pooled.size) * 2)
        y = conv_op(f"{name}.conv1", cp[name]["conv1"], cp[name]["bn1"],
                    cs[name]["bn1"], pooled, b)
        y = conv_op(f"{name}.conv2", cp[name]["conv2"], cp[name]["bn2"],
                    cs[name]["bn2"], y, b)
        skips[name] = y
        xin = y

    # ---------------- up blocks: upsample+pad+concat -> conv1 -> conv2 ------
    # conv1 consumes the pre-padded concat (production path: the upsample
    # matmul emits its halo for free and the skip takes the selection pad)
    ups = (("up1", skips["down3"]), ("up2", skips["down2"]),
           ("up3", skips["x2"]))
    for name, skip in ups:
        up = jax.jit(lambda a, c: jnp.concatenate(
            [reflect_pad1(c),
             upsample_bilinear_x2_align_corners(a, pad_output=True)],
            axis=-1))
        cat = up(xin, skip)
        hh, ww = xin.shape[1], xin.shape[2]
        cu = xin.shape[3]
        # upsample = two interp matmuls: [2h,h]x[...] + [2w,w]
        flops = 2 * b * cu * (2 * hh * hh * ww + 2 * ww * 2 * hh * ww)
        bytes_ = (xin.size + skip.size + cat.size) * 2
        report(f"{name}.up+pad+cat", timed(up, xin, skip), flops, bytes_)
        p, st = cp[name]["conv"], cs[name]["conv"]
        fn = jax.jit(lambda x, p=p, st=st: jnp.maximum(batch_norm(
            conv2d(x, p["conv1"], padding="REFLECT",
                   compute_dtype=cdt, prepadded=True),
            p["bn1"], st["bn1"], train=False)[0], 0))
        out = fn(cat)
        oh, ow = out.shape[1], out.shape[2]
        flops = 2 * b * oh * ow * cat.shape[3] * out.shape[3] * 9
        report(f"{name}.conv1(prepad)", timed(fn, cat), flops,
               (cat.size + out.size) * 2)
        y = conv_op(f"{name}.conv2", p["conv2"], p["bn2"], st["bn2"], out, b)
        xin = y

    # ---------------- whole core (fused), for composition check -------------
    core = jax.jit(lambda x2: core_apply(
        cp, cs, x2, cfg, train=False, rng=jax.random.key(0))[0])
    core(x2_concat)
    t_core = timed(core, x2_concat)
    print(f"\nwhole core (fused jit): {t_core*1e3:.2f} ms")
    t_sum = sum(r[1] for r in ROWS)
    print(f"sum of isolated ops: {t_sum:.2f} ms")

    print("\n| op | ms | TF/s | GB/s | bound | attainable TF/s |")
    print("|---|---|---|---|---|---|")
    for r in ROWS:
        print(f"| {r[0]} | {r[1]:.2f} | {r[2]:.1f} | {r[3]:.1f} | {r[4]} "
              f"| {r[5]:.0f} |")


if __name__ == "__main__":
    main()
