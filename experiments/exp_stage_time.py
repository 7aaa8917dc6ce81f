"""Per-stage timing of the CT fast-path forward (flagship, B=128)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import dataclasses
import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import (
    MimoUNetConfig, mimo_unet_init, core_apply)
from mimo_unet_tpu.models import fast_path as fp
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8, fold_bn_eval, fused_double_conv_ct, pack_w3x3, pick_th)


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def mat(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1].astype(jnp.float32)))

    mat(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        mat(r)
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    b, s, h, w, cin, f = 128, 2, 256, 256, 3, 21
    cfg = MimoUNetConfig(in_channels=cin, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (b, s, h, w, cin))
    fa = align8(f)
    n = s * b
    cdt = jnp.bfloat16

    enc_p, enc_s = params["encoder"], state["encoder"]
    dec_p, dec_s = params["decoder"], state["decoder"]

    # stage 1: to CT
    to_ct = jax.jit(lambda x: jnp.transpose(
        x.astype(cdt), (4, 1, 0, 2, 3)).reshape(cin, -1))
    xct = to_ct(x)
    print(f"to_ct: {timed(to_ct, x)*1e3:.2f} ms", flush=True)

    # stage 2: in_conv
    w1p, s1, sh1, w2p, s2, sh2 = fp._fold_dc(
        enc_p["in_conv"]["conv1"], enc_p["in_conv"]["bn1"], enc_s["in_conv"]["bn1"],
        enc_p["in_conv"]["conv2"], enc_p["in_conv"]["bn2"], enc_s["in_conv"]["bn2"])
    in_conv = jax.jit(lambda xct: fused_double_conv_ct(
        xct, w1p, s1, sh1, w2p, s2, sh2,
        h=h, w=w, th=pick_th(h, w, cin, 0, f, f, fa), c1=cin, m=f, o=f))
    x1s = in_conv(xct)
    print(f"in_conv: {timed(in_conv, xct)*1e3:.2f} ms", flush=True)

    # stage 3: pool
    h2, w2 = h // 2, w // 2
    pool = jax.jit(lambda a: fp._pool_ct(a, n, h, w))
    pooled = pool(x1s)
    print(f"pool: {timed(pool, x1s)*1e3:.2f} ms", flush=True)

    # stage 4: down1
    d1c1, d1c2 = enc_p["down1"]["conv1"], enc_p["down1"]["conv2"]
    s1d, sh1d = fold_bn_eval(d1c1["b"], enc_p["down1"]["bn1"], enc_s["down1"]["bn1"])
    s2d, sh2d = fold_bn_eval(d1c2["b"], enc_p["down1"]["bn2"], enc_s["down1"]["bn2"])

    def pack_down1(wg):
        wide = jnp.zeros((3, 3, fa, 2 * f), wg.dtype).at[:, :, :f].set(wg)
        return pack_w3x3([wide])

    w1pd = jnp.stack([pack_down1(d1c1["w"][g]) for g in range(s)])
    w2pd = jnp.stack([pack_w3x3([d1c2["w"][g]]) for g in range(s)])
    down1 = jax.jit(lambda a: fused_double_conv_ct(
        a, w1pd, s1d, sh1d, w2pd, s2d, sh2d,
        h=h2, w=w2, th=pick_th(h2, w2, fa, 0, 2 * f, 2 * f, align8(2 * f)),
        c1=fa, m=2 * f, o=2 * f))
    x2s = down1(pooled)
    print(f"down1: {timed(down1, pooled)*1e3:.2f} ms", flush=True)

    # stage 5: to NHWC + core
    f2 = 2 * f

    @jax.jit
    def core(x2s):
        x2_nhwc = x2s[:f2].reshape(f2, s, b, h2, w2)
        x2_concat = jnp.transpose(x2_nhwc, (2, 3, 4, 1, 0)).reshape(
            b, h2, w2, s * f2)
        x_up, _ = core_apply(params["core"], state["core"], x2_concat, cfg,
                             train=False, rng=jax.random.key(0))
        return x_up

    x_up = core(x2s)
    print(f"core(+transpose): {timed(core, x2s)*1e3:.2f} ms", flush=True)

    # stage 6: upsample to CT
    c_up = x_up.shape[-1]
    c_up_a = align8(c_up)

    @jax.jit
    def upsample(x_up):
        xup_ct = jnp.transpose(x_up.astype(cdt), (3, 0, 1, 2))
        xup_ct = jnp.pad(xup_ct, ((0, c_up_a - c_up), (0, 0), (0, 0), (0, 0)))
        return fp._upsample_ct_x2(xup_ct.reshape(c_up_a, -1), b, h2, w2)

    xup_ct = upsample(x_up)
    print(f"upsample_ct(+transpose): {timed(upsample, x_up)*1e3:.2f} ms",
          flush=True)

    # stage 7: decoder kernel (+fused outconv)
    conv1 = dec_p["up4"]["conv"]["conv1"]
    conv2 = dec_p["up4"]["conv"]["conv2"]
    bn1_s, bn2_s = dec_s["up4"]["conv"]["bn1"], dec_s["up4"]["conv"]["bn2"]
    mid_c = conv1["w"].shape[4]
    s1e, sh1e = fold_bn_eval(conv1["b"], dec_p["up4"]["conv"]["bn1"], bn1_s)
    s2e, sh2e = fold_bn_eval(conv2["b"], dec_p["up4"]["conv"]["bn2"], bn2_s)

    def pack_dec(wg):
        skip_blk = jnp.zeros((3, 3, fa, mid_c), wg.dtype).at[:, :, :f].set(
            wg[:, :, :f])
        up_blk = jnp.zeros((3, 3, c_up_a, mid_c), wg.dtype).at[
            :, :, :c_up].set(wg[:, :, f:])
        return pack_w3x3([skip_blk, up_blk])

    w1pe = jnp.stack([pack_dec(conv1["w"][g]) for g in range(s)])
    w2pe = jnp.stack([pack_w3x3([conv2["w"][g]]) for g in range(s)])
    outc = dec_p["outc"]
    oc = outc["w"].shape[4]
    oca = align8(oc)
    wo = jnp.zeros((s, f, oca), jnp.float32).at[:, :, :oc].set(outc["w"][:, 0, 0])
    bo = jnp.zeros((s, oca), jnp.float32).at[:, :oc].set(outc["b"])

    dec = jax.jit(lambda x1s, xup: fused_double_conv_ct(
        x1s, w1pe, s1e, sh1e, w2pe, s2e, sh2e,
        h=h, w=w, th=pick_th(h, w, fa, c_up_a, mid_c, f, oca),
        c1=fa, m=mid_c, o=f, x2=xup, c2=c_up_a, n2_images=b, wo=wo, bo=bo))
    out = dec(x1s, xup_ct)
    print(f"decoder: {timed(dec, x1s, xup_ct)*1e3:.2f} ms", flush=True)

    # stage 8: final transpose
    @jax.jit
    def finish(out):
        logits = out[:oc].reshape(oc, s, b, h, w)
        return jnp.transpose(logits, (2, 1, 3, 4, 0)).astype(jnp.float32)

    print(f"finish: {timed(finish, out)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
