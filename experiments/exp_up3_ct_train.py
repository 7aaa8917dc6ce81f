"""Train-mode up3 via the CT train kernels vs the XLA Up block (B=128).

Times one fwd+bwd (value_and_grad of a sum on the output) of:
  XLA: up_apply(train=True) from xu2 NHWC + x2_concat NHWC, plus the
       decoder-side NHWC->CT transpose its output pays today
  CT : transpose-regroup skip (differentiable glue) + CT matmul upsample
       + conv3x3_ct_train x2 with BN-from-stats glue, output stays CT

Gradient parity is checked against the XLA block (cosine per leaf).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig, mimo_unet_init
from mimo_unet_tpu.models.blocks import up_apply
from mimo_unet_tpu.models.fast_path import (
    _bn_affine_from_stats, _prologue_cols, _upsample_ct_x2)
from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas.ct_elem import affine_relu_ct
from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train, pick_th_train


def timed(fn, *args, reps=10):
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
    h2 = w2 = 128
    h4, w4 = h2 // 2, w2 // 2
    f2, fs = 2 * f, f * s
    f2a = align8(f2)
    cfg = MimoUNetConfig(in_channels=3, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    up3_p = params["core"]["up3"]
    up3_s = state["core"]["up3"]
    cdt = jnp.bfloat16
    c_xu2 = 2 * fs
    c_upa = align8(c_xu2)
    m3, o3 = 2 * fs, fs
    cnt = b * h2 * w2

    xu2 = jax.random.normal(jax.random.key(1), (b, h4, w4, c_xu2)).astype(cdt)
    x2s5 = jax.random.normal(jax.random.key(2),
                             (f2a, s, b, h2, w2)).astype(cdt)
    x2s5 = x2s5.at[f2:].set(0.0)

    # ---- XLA block ---------------------------------------------------------
    def xla_loss(p, xu2_, x2s5_):
        x2c = jnp.transpose(x2s5_[:f2], (2, 3, 4, 1, 0)).reshape(
            b, h2, w2, s * f2)
        y, st = up_apply(p, up3_s, xu2_, x2c, None, mode=cfg.mode,
                         train=True, compute_dtype=cdt, split_skip_conv=True)
        yct = jnp.transpose(y.astype(cdt), (3, 0, 1, 2)).reshape(o3, -1)
        return jnp.sum(yct.astype(jnp.float32) ** 2), (yct, st)

    # ---- CT composite ------------------------------------------------------
    def widen(wg, c_real, c_pad, m):
        return jnp.zeros((3, 3, c_pad, m), wg.dtype).at[:, :, :c_real].set(wg)

    def ct_loss(p, xu2_, x2s5_):
        pc = p["conv"]
        c1w = pc["conv1"]["w"]
        skip_w = jnp.zeros((3, 3, s * f2a, m3), c1w.dtype)
        for g in range(s):
            skip_w = skip_w.at[:, :, g * f2a:g * f2a + f2].set(
                c1w[:, :, g * f2:(g + 1) * f2])
        up_w = widen(c1w[:, :, s * f2:], c_xu2, c_upa, m3)
        w1p = pack_w3x3([skip_w, up_w])[None].astype(cdt)
        m3a = align8(m3)
        w2p = pack_w3x3([widen(pc["conv2"]["w"], m3, m3a, o3)])[None].astype(cdt)

        xc = jnp.transpose(x2s5_, (1, 0, 2, 3, 4)).reshape(s * f2a, -1)
        xu = jnp.transpose(xu2_.astype(cdt), (3, 0, 1, 2)).reshape(c_xu2, -1)
        xu = jnp.pad(xu, ((0, c_upa - c_xu2), (0, 0)))
        xu = _upsample_ct_x2(xu, b, h4, w4)

        y1, s1, q1 = conv3x3_ct_train(
            xc, xu, w1p, None, None, h2, w2,
            pick_th_train(h2, w2, s * f2a, c_upa, m3), s * f2a, c_upa, m3,
            b, None)
        sc1, sh1, bn1_st = _bn_affine_from_stats(
            s1, q1, cnt, pc["conv1"]["b"], pc["bn1"], up3_s["conv"]["bn1"])
        y2, s2, q2 = conv3x3_ct_train(
            y1, None, w2p, _prologue_cols([(sc1, m3)], m3a),
            _prologue_cols([(sh1, m3)], m3a), h2, w2,
            pick_th_train(h2, w2, m3a, 0, o3), m3a, 0, o3, 0, None)
        sc2, sh2, bn2_st = _bn_affine_from_stats(
            s2, q2, cnt, pc["conv2"]["b"], pc["bn2"], up3_s["conv"]["bn2"])
        z = affine_relu_ct(y2, sc2[..., None], sh2[..., None], o3, 1, None)
        st = {"conv": {"bn1": bn1_st, "bn2": bn2_st}}
        return jnp.sum(z.astype(jnp.float32) ** 2), (z, st)

    gx = jax.jit(jax.value_and_grad(xla_loss, has_aux=True))
    gc = jax.jit(jax.value_and_grad(ct_loss, has_aux=True))

    (lx, (yx, _)), grx = gx(up3_p, xu2, x2s5)
    (lc, (yc, _)), grc = gc(up3_p, xu2, x2s5)
    ax = yx.astype(jnp.float32).reshape(-1)
    ac = yc[:o3].astype(jnp.float32).reshape(-1)
    cos = float(jnp.dot(ax, ac) / (jnp.linalg.norm(ax) * jnp.linalg.norm(ac)))
    print(f"fwd cosine {cos:.6f}  loss rel "
          f"{abs(lx - lc) / abs(lx):.3e}")
    for path, a in jax.tree_util.tree_leaves_with_path(grx):
        c = a  # placeholder
    import jax.tree_util as jtu
    for (pa, ga), (pb, gb) in zip(
            jtu.tree_leaves_with_path(grx), jtu.tree_leaves_with_path(grc)):
        va = ga.astype(jnp.float32).reshape(-1)
        vb = gb.astype(jnp.float32).reshape(-1)
        cosg = float(jnp.dot(va, vb)
                     / (jnp.linalg.norm(va) * jnp.linalg.norm(vb) + 1e-12))
        print(f"  grad cos {cosg:+.5f}  {jtu.keystr(pa)}")

    tx = timed(gx, up3_p, xu2, x2s5)
    tc = timed(gc, up3_p, xu2, x2s5)
    print(f"XLA up3 train fwd+bwd: {tx*1e3:.2f} ms")
    print(f"CT  up3 train fwd+bwd: {tc*1e3:.2f} ms")


if __name__ == "__main__":
    main()
