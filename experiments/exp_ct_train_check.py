"""Interpret-mode check: conv3x3_ct_train fwd + custom VJP vs XLA autodiff."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "tpu" not in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "tpu" not in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mimo_unet_tpu.ops.conv import reflect_pad1
from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train

INTERP = "tpu" not in sys.argv[1:]


def xla_equiv(x1n, x2n, w, scale, shift, groups, prologue):
    """NHWC reference: per-group conv over the (optionally prologued,
    optionally concat) input; returns (y, sum, sumsq) like the kernel."""
    from jax import lax

    n = x1n.shape[0]
    npg = n // groups
    xs = [x1n]
    if x2n is not None:
        reps = n // x2n.shape[0]
        xs.append(jnp.tile(x2n, (reps, 1, 1, 1)))
    x = jnp.concatenate(xs, axis=-1)
    if prologue:
        ys = []
        for g in range(groups):
            xg = x[g * npg:(g + 1) * npg].astype(jnp.float32)
            a = (xg * scale[g].reshape(1, 1, 1, -1)
                 + shift[g].reshape(1, 1, 1, -1))
            ys.append(jnp.maximum(a, 0.0).astype(x.dtype))
        x = jnp.concatenate(ys, axis=0)
    outs = []
    for g in range(groups):
        xg = x[g * npg:(g + 1) * npg]
        y = lax.conv_general_dilated(
            reflect_pad1(xg), w[g].astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(y)
    y = jnp.concatenate(outs, axis=0)
    yf = y.astype(jnp.float32)
    s = jnp.stack([jnp.sum(yf[g * npg:(g + 1) * npg], axis=(0, 1, 2))
                   for g in range(groups)])
    q = jnp.stack([jnp.sum(jnp.square(yf[g * npg:(g + 1) * npg]),
                           axis=(0, 1, 2)) for g in range(groups)])
    return y, s, q


def to_ct(xn):
    c = xn.shape[-1]
    return jnp.moveaxis(xn, -1, 0).reshape(c, -1)


def check(name, *, c1, c2, o, h, w, n, n2, groups, th, prologue):
    ks = jax.random.split(jax.random.key(hash(name) % 2**31), 8)
    x1n = (jax.random.normal(ks[0], (n, h, w, c1), jnp.float32)
           ).astype(jnp.bfloat16)
    x2n = None
    if c2:
        x2n = (jax.random.normal(ks[1], (n2, h, w, c2), jnp.float32)
               ).astype(jnp.bfloat16)
    cin = c1 + (c2 or 0)
    wconv = jax.random.normal(ks[2], (groups, 3, 3, cin, o),
                              jnp.float32) * 0.2
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    if prologue:
        scale_n = jax.random.uniform(ks[3], (groups, cin), minval=0.5,
                                     maxval=1.5)
        shift_n = jax.random.normal(ks[4], (groups, cin)) * 0.3
        scale_p = jnp.zeros((groups, cp, 1)).at[:, :c1, 0].set(
            scale_n[:, :c1])
        shift_p = jnp.zeros((groups, cp, 1)).at[:, :c1, 0].set(
            shift_n[:, :c1])
        if c2:
            scale_p = scale_p.at[:, c1a:c1a + c2, 0].set(scale_n[:, c1:])
            shift_p = shift_p.at[:, c1a:c1a + c2, 0].set(shift_n[:, c1:])
    else:
        scale_n = shift_n = None
        scale_p = shift_p = None

    def pack(wg):
        if c2:
            b1 = jnp.zeros((3, 3, c1a, o)).at[:, :, :c1].set(wg[:, :, :c1])
            b2 = jnp.zeros((3, 3, c2a, o)).at[:, :, :c2].set(wg[:, :, c1:])
            return pack_w3x3([b1, b2])
        return pack_w3x3([wg])

    wp = jnp.stack([pack(wconv[g]) for g in range(groups)])

    x1 = to_ct(x1n)
    x2 = to_ct(x2n) if c2 else None

    def kfn(x1, x2, wp, sc, sh):
        y, s, q = conv3x3_ct_train(
            x1, x2, wp, sc, sh, h, w, th, c1, c2 or 0, o, n2 or 0, INTERP)
        return y, s, q

    def rfn(x1n, x2n, wconv, sc, sh):
        return xla_equiv(x1n, x2n, wconv, sc, sh, groups, prologue)

    # ---- forward
    y_k, s_k, q_k = kfn(x1, x2, wp, scale_p, shift_p)
    y_r, s_r, q_r = rfn(x1n, x2n, wconv,
                        scale_n if prologue else None,
                        shift_n if prologue else None)
    y_r_ct = to_ct(y_r)
    sc_ref = float(jnp.max(jnp.abs(y_r_ct.astype(jnp.float32)))) or 1.0
    err = float(jnp.max(jnp.abs(y_k[:o].astype(jnp.float32)
                                - y_r_ct.astype(jnp.float32))))
    serr = float(jnp.max(jnp.abs(s_k - s_r))) / (
        float(jnp.max(jnp.abs(s_r))) + 1e-6)
    qerr = float(jnp.max(jnp.abs(q_k - q_r))) / (
        float(jnp.max(jnp.abs(q_r))) + 1e-6)
    print(f"{name} fwd: yerr={err/sc_ref:.2e} serr={serr:.2e} "
          f"qerr={qerr:.2e}", flush=True)

    # ---- gradients: scalar loss touching y, sum, sumsq
    cy = jax.random.normal(ks[5], y_r_ct[:o].shape, jnp.float32) * 0.1
    cs = jax.random.normal(ks[6], s_r.shape, jnp.float32) * 0.1
    cq = jax.random.normal(ks[7], q_r.shape, jnp.float32) * 0.01

    def loss_k(x1, x2, wp, sc, sh):
        y, s, q = kfn(x1, x2, wp, sc, sh)
        return (jnp.sum(y[:o].astype(jnp.float32) * cy)
                + jnp.sum(s * cs) + jnp.sum(q * cq))

    cy_n = jnp.moveaxis(cy.reshape(o, n, h, w), 0, -1)

    def loss_r(x1n, x2n, wconv, sc, sh):
        y, s, q = rfn(x1n, x2n, wconv, sc, sh)
        return (jnp.sum(y.astype(jnp.float32) * cy_n)
                + jnp.sum(s * cs) + jnp.sum(q * cq))

    argnums = (0, 2) if not c2 else (0, 1, 2)
    if prologue:
        argnums = argnums + (3, 4)
    gk = jax.grad(loss_k, argnums=argnums)(x1, x2, wp, scale_p, shift_p)
    gr = jax.grad(loss_r, argnums=argnums)(
        x1n, x2n, wconv,
        scale_n if prologue else None,
        shift_n if prologue else None)

    # dx1
    gx_r = to_ct(gr[0]).astype(jnp.float32)
    d = float(jnp.max(jnp.abs(gk[0][:c1].astype(jnp.float32) - gx_r)))
    scl = float(jnp.max(jnp.abs(gx_r))) + 1e-6
    print(f"{name} dx1: relerr={d/scl:.2e}", flush=True)
    idx = 1
    if c2:
        gx2_r = to_ct(gr[1]).astype(jnp.float32)
        d = float(jnp.max(jnp.abs(gk[1][:c2].astype(jnp.float32) - gx2_r)))
        scl = float(jnp.max(jnp.abs(gx2_r))) + 1e-6
        print(f"{name} dx2: relerr={d/scl:.2e}", flush=True)
        idx = 2
    # dw: unpack kernel's packed grad and compare
    dwp = gk[idx]
    dw_r = gr[idx]
    oa = align8(o)
    for g in range(groups):
        got1 = jnp.stack([
            jnp.stack([dwp[g, dy * cp:dy * cp + c1, dx * oa:dx * oa + o]
                       for dx in range(3)], axis=0)
            for dy in range(3)], axis=0)  # [3, 3, c1, o]
        want1 = dw_r[g][:, :, :c1]
        d = float(jnp.max(jnp.abs(got1.astype(jnp.float32)
                                  - want1.astype(jnp.float32))))
        scl = float(jnp.max(jnp.abs(want1))) + 1e-6
        print(f"{name} dw g{g}: relerr={d/scl:.2e}", flush=True)
    if prologue:
        dsc_k, dsh_k = gk[idx + 1], gk[idx + 2]
        dsc_r, dsh_r = gr[idx + 1], gr[idx + 2]
        d = float(jnp.max(jnp.abs(dsc_k[:, :c1, 0] - dsc_r[:, :c1])))
        scl = float(jnp.max(jnp.abs(dsc_r))) + 1e-6
        print(f"{name} dscale: relerr={d/scl:.2e}", flush=True)
        d = float(jnp.max(jnp.abs(dsh_k[:, :c1, 0] - dsh_r[:, :c1])))
        scl = float(jnp.max(jnp.abs(dsh_r))) + 1e-6
        print(f"{name} dshift: relerr={d/scl:.2e}", flush=True)


if __name__ == "__main__":
    check("basic", c1=5, c2=0, o=6, h=16, w=256, n=2, n2=0, groups=1,
          th=8, prologue=False)
    check("prologue", c1=5, c2=0, o=6, h=16, w=256, n=2, n2=0, groups=1,
          th=8, prologue=True)
    check("groups", c1=4, c2=0, o=5, h=16, w=256, n=4, n2=0, groups=2,
          th=8, prologue=True)
    check("two_input", c1=4, c2=6, o=5, h=16, w=256, n=4, n2=2, groups=2,
          th=8, prologue=False)
