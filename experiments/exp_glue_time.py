"""Time the train-path XLA glue pieces standalone (B=64, n=128)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp


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
    s, b, h, w, f = 2, 64, 256, 256, 21
    n = s * b
    total = n * h * w
    cdt = jnp.bfloat16
    fa = 24

    y = jax.random.normal(jax.random.key(0), (fa, total), jnp.float32
                          ).astype(cdt)
    sc = jax.random.uniform(jax.random.key(1), (s, f))
    sh = jax.random.normal(jax.random.key(2), (s, f))

    # apply_affine (z = relu(y*scale+shift) group-blocked) fwd+bwd
    def aff(y, sc, sh):
        yg = y[:f].reshape(f, s, -1).astype(jnp.float32)
        z = yg * sc.T[:, :, None] + sh.T[:, :, None]
        return jnp.maximum(z, 0.0).astype(cdt).reshape(f, -1)

    ga = jax.jit(jax.grad(lambda y, sc, sh: jnp.sum(
        aff(y, sc, sh).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    print(f"apply_affine fwd+bwd: {timed(ga, y, sc, sh)*1e3:.1f} ms",
          flush=True)

    # g_eff expression (bwd-only glue, runs once per conv)
    dy = jax.random.normal(jax.random.key(3), (fa, total), jnp.float32
                           ).astype(cdt)
    ds = jax.random.normal(jax.random.key(4), (s, f))
    dq = jax.random.normal(jax.random.key(5), (s, f)) * 0.01

    @jax.jit
    def geff(dy, yraw, ds, dq):
        o = f
        yf = yraw[:o].astype(jnp.float32)
        npg = total // s
        ds_b = jnp.broadcast_to(ds.astype(jnp.float32).T[:, :, None],
                                (o, s, npg)).reshape(o, total)
        dq_b = jnp.broadcast_to(dq.astype(jnp.float32).T[:, :, None],
                                (o, s, npg)).reshape(o, total)
        ge = dy[:o].astype(jnp.float32) + ds_b + 2.0 * yf * dq_b
        ge = ge.astype(cdt)
        return jnp.concatenate(
            [ge, jnp.zeros((fa - o, total), cdt)], axis=0)

    print(f"g_eff: {timed(geff, dy, y, ds, dq)*1e3:.1f} ms", flush=True)

    # outc einsum fwd+bwd
    wo = jax.random.normal(jax.random.key(6), (s, f, 2))
    bo = jax.random.normal(jax.random.key(7), (s, 2))

    def outc(z6, wo, bo):
        z6g = z6[:f].reshape(f, s, -1)
        lg = jnp.einsum("fsn,sfo->osn", z6g, wo.astype(cdt))
        return lg + bo.T.astype(cdt)[:, :, None]

    go = jax.jit(jax.grad(lambda z, wo, bo: jnp.sum(
        outc(z, wo, bo).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    print(f"outc fwd+bwd: {timed(go, y, wo, bo)*1e3:.1f} ms", flush=True)

    # final transposes fwd+bwd
    @jax.jit
    def fin(lg):
        out = lg.reshape(2, s, b, h, w)
        return jnp.transpose(out, (2, 1, 3, 4, 0)).astype(jnp.float32)

    lg = jax.random.normal(jax.random.key(8), (2, total), jnp.float32
                           ).astype(cdt)
    gf = jax.jit(jax.grad(lambda lg: jnp.sum(fin(lg) ** 2)))
    print(f"final transpose fwd+bwd: {timed(gf, lg)*1e3:.1f} ms", flush=True)

    # input transpose fwd
    x = jax.random.uniform(jax.random.key(9), (b, s, h, w, 3))

    @jax.jit
    def toct(x):
        return jnp.transpose(x.astype(cdt), (4, 1, 0, 2, 3)).reshape(3, -1)

    print(f"to_ct fwd: {timed(toct, x)*1e3:.1f} ms", flush=True)

    # weight packing fwd+bwd (decoder conv1, worst case)
    from mimo_unet_tpu.ops.pallas.ct_conv import pack_w3x3
    wc = jax.random.normal(jax.random.key(10), (s, 3, 3, 63, 31))

    def packall(wc):
        def one(wg):
            b1 = jnp.zeros((3, 3, 24, 31)).at[:, :, :21].set(wg[:, :, :21])
            b2 = jnp.zeros((3, 3, 48, 31)).at[:, :, :42].set(wg[:, :, 21:])
            return pack_w3x3([b1, b2])
        return jnp.stack([one(wc[g]) for g in range(s)])

    gp = jax.jit(jax.grad(lambda wc: jnp.sum(packall(wc) ** 2)))
    print(f"pack fwd+bwd: {timed(gp, wc)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
