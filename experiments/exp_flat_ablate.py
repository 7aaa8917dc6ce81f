"""Ablate the flat fused-DoubleConv kernel to locate per-tile overheads.

Variants (decoder shape, B=64):
  full_f32      : baseline (f32 y scratches, full combine)
  no_combine    : dots + affine on middle plane only (no rolls/wheres)
  no_colcopy    : skip col building (dots read stale cols) — copy cost
  bf16_y        : dot emits bf16, combine in bf16 — VPU traffic halved
  th32_bf16     : bf16 variant at th=32 (fits VMEM)
  fused_outc    : bf16_y + 1x1 out-conv fused in epilogue
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align8(n):
    return (n + 7) // 8 * 8


def _roll(v, shift):
    return pltpu.roll(v, shift % v.shape[-1], axis=v.ndim - 1)


def _combine(y_ref, mpad, m, w, s_ref, b_ref, out_dtype, mode):
    if mode == "no_combine":
        out = y_ref[mpad:mpad + m].astype(jnp.float32) * s_ref[:] + b_ref[:]
        return jnp.maximum(out, 0.0).astype(out_dtype)
    n = y_ref.shape[1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    first = (j & (w - 1)) == 0
    last = (j & (w - 1)) == (w - 1)
    y0 = y_ref[0:m]
    y1 = y_ref[mpad:mpad + m]
    y2 = y_ref[2 * mpad:2 * mpad + m]
    left = jnp.where(first, _roll(y0, -1), _roll(y0, 1))
    right = jnp.where(last, _roll(y2, 1), _roll(y2, -1))
    out = (left + y1 + right).astype(jnp.float32) * s_ref[:] + b_ref[:]
    return jnp.maximum(out, 0.0).astype(out_dtype)


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, wo_ref,
            out_ref, col1, y1s, mid, col2, y2s, *,
            th, w, c, m, o, oc, out_dtype, mode):
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    r1 = th + 2
    ca, ma = _align8(c), _align8(m)
    ydt = y1s.dtype

    do_copies = mode not in ("no_colcopy", "dots_only", "one_dot", "nothing")
    if do_copies:
        for dy in range(3):
            col1[dy * ca:dy * ca + c] = (
                x_ref[0, :, (2 + dy) * w:(2 + dy + r1) * w])
            if ca > c:
                col1[dy * ca + c:(dy + 1) * ca] = jnp.zeros(
                    (ca - c, r1 * w), col1.dtype)
        @pl.when(i == 0)
        def _():
            col1[0:c, w:2 * w] = x_ref[0, :, 5 * w:6 * w]
        @pl.when(i == n_tiles - 1)
        def _():
            col1[2 * ca:2 * ca + c, th * w:(th + 1) * w] = (
                x_ref[0, :, (th + 2) * w:(th + 3) * w])

    if mode == "nothing":
        out_ref[0] = x_ref[0, :o, 2 * w:(2 + th) * w].astype(out_dtype)
        return
    if mode != "one_dot":
        y1s[...] = jax.lax.dot_general(
            w1_ref[:], col1[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=ydt)
    if mode in ("dots_only", "one_dot"):
        y2s[...] = jax.lax.dot_general(
            w2_ref[:], col2[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=ydt)
        out_ref[0] = y2s[:o, :].astype(out_dtype)
        return
    mid[...] = _combine(y1s, ma, m, w, s1_ref, b1_ref, mid.dtype, mode)

    @pl.when(i == 0)
    def _():
        mid[:, 0:w] = mid[:, 2 * w:3 * w]

    @pl.when(i == n_tiles - 1)
    def _():
        mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:(r1 - 2) * w]

    if do_copies:
        for dy in range(3):
            col2[dy * ma:dy * ma + m] = mid[:, dy * w:(dy + th) * w]
            if ma > m:
                col2[dy * ma + m:(dy + 1) * ma] = jnp.zeros(
                    (ma - m, th * w), col2.dtype)

    y2s[...] = jax.lax.dot_general(
        w2_ref[:], col2[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=ydt)
    y2 = _combine(y2s, _align8(o), o, w, s2_ref, b2_ref,
                  jnp.float32 if mode == "fused_outc" else out_dtype, mode)
    if mode == "fused_outc":
        out_ref[0] = jax.lax.dot_general(
            wo_ref[:], y2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_dtype)
    else:
        out_ref[0] = y2.astype(out_dtype)


def pack_w(wconv):
    _, _, c, m = wconv.shape
    ca, ma = _align8(c), _align8(m)
    out = jnp.zeros((3 * ca, 3 * ma), wconv.dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[dy * ca:dy * ca + c, dx * ma:dx * ma + m].set(
                wconv[dy, dx])
    return out


@functools.partial(jax.jit, static_argnames=("th", "mode"))
def run(x, w1, s1, b1, w2, s2, b2, wo, *, th=16, mode="full_f32"):
    bsz, c, h, w = x.shape
    m, o = w1.shape[3], w2.shape[3]
    oc = wo.shape[3]
    f32 = jnp.float32
    ydt = jnp.bfloat16 if mode in ("bf16_y", "th32_bf16", "fused_outc") else f32
    ca, ma, oa = _align8(c), _align8(m), _align8(o)
    out_c = oc if mode == "fused_outc" else o
    xf = x.reshape(bsz, c, h * w)
    xf = jnp.concatenate([xf[:, :, :4 * w], xf], axis=-1)
    kern = functools.partial(
        _kernel, th=th, w=w, c=c, m=m, o=o, oc=oc, out_dtype=x.dtype,
        mode=mode)
    out = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c),
                 pl.Element((th + 8) * w, padding=(0, 8 * w))),
                lambda b, i: (b, 0, pl.multiple_of(i * th * w, 128)),
                memory_space=pltpu.VMEM,
            ),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(out_c), pl.Element(th * w)),
            lambda b, i: (b, 0, pl.multiple_of(i * th * w + 4 * w, 128)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, out_c, (h + 4) * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * ca, (th + 2) * w), x.dtype),
            pltpu.VMEM((3 * ma, (th + 2) * w), ydt),
            pltpu.VMEM((m, (th + 2) * w), x.dtype),
            pltpu.VMEM((3 * ma, th * w), x.dtype),
            pltpu.VMEM((3 * oa, th * w), ydt),
        ],
    )(xf, pack_w(w1).astype(x.dtype),
      s1.reshape(m, 1).astype(f32), b1.reshape(m, 1).astype(f32),
      pack_w(w2).astype(x.dtype),
      s2.reshape(o, 1).astype(f32), b2.reshape(o, 1).astype(f32),
      wo.reshape(o, oc).astype(x.dtype))
    return out[:, :, 4 * w:].reshape(bsz, out_c, h, w)


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[0, 0, :2, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    c, m, o, h, w, bsz = 63, 31, 21, 256, 256, 64
    ks = jax.random.split(jax.random.key(0), 9)
    x = jax.random.normal(ks[0], (bsz, c, h, w), jnp.float32).astype(
        jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (3, 3, c, m), jnp.float32) * 0.1
    s1 = jnp.ones((m,))
    b1 = jnp.zeros((m,))
    w2 = jax.random.normal(ks[2], (3, 3, m, o), jnp.float32) * 0.1
    s2 = jnp.ones((o,))
    b2 = jnp.zeros((o,))
    wo = jax.random.normal(ks[3], (1, 1, o, 4), jnp.float32) * 0.1
    gflop = 2 * 9 * (c * m + m * o) * h * w * bsz / 1e9

    cases = [
        ("full_f32", 16), ("nothing", 16), ("one_dot", 16),
        ("dots_only", 16), ("fused_outc", 16),
    ]
    ref = None
    for mode, th in cases:
        try:
            fn = functools.partial(run, th=th, mode=mode)
            out = fn(x, w1, s1, b1, w2, s2, b2, wo)
            t = timed(fn, x, w1, s1, b1, w2, s2, b2, wo)
            extra = ""
            if mode == "full_f32":
                ref = out
            elif mode == "bf16_y" and ref is not None:
                d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
                sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
                extra = f"  vs_f32_relerr={d/sc:.2e}"
            print(f"{mode} th={th}: {t*1e3:.2f} ms  {gflop/t/1e3:.1f} TF/s"
                  f"{extra}", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:150]
            print(f"{mode} th={th}: ERROR {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
