"""VERDICT item 6 measurement: fused ensemble vs sequential loop.

3 members (same config), MC=5, B=4 at 256px — the reference's headline
serving mode (ensemble.py:76-115).  "Sequential" = one forward per
(member, pass) as the reference loops; "fused" = the production Ensemble
(MC folded into batch, members vmapped over stacked params).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import tempfile

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.train.checkpoint import save_checkpoint
from mimo_unet_tpu.models.ensemble import Ensemble
from mimo_unet_tpu.transforms import repeat_subnetworks


def timed(fn, *args, reps=20):
    float(fn(*args))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    mc, members, bsz = 5, 3, 4
    tmp = tempfile.mkdtemp()
    paths = []
    tasks = []
    for m in range(members):
        task = MimoUnetTask(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=21, loss="laplace_nll", seed=m,
            compute_dtype="bfloat16", final_dropout_rate=0.1)
        st = task.init_state(steps_per_epoch=1)
        p = os.path.join(tmp, f"m{m}")
        save_checkpoint(p, st, task.hparams())
        paths.append(p)
        tasks.append((task, st))

    x = jax.random.normal(jax.random.key(9), (bsz, 256, 256, 3))

    # --- sequential reference: one jitted forward per (member, pass) ------
    def seq_member(task, params, mstate, image, rng):
        xs = repeat_subnetworks(image, task.num_subnetworks)
        (p1, p2), _ = task.forward(params, mstate, xs, train=False,
                                   rng=rng, mc_dropout=True)
        return p1, p2

    seq_fns = [jax.jit(lambda p, ms, im, r, t=t: seq_member(t, p, ms, im, r))
               for t, _ in tasks]

    def sequential(image):
        acc = 0.0
        for m, (fn, (task, st)) in enumerate(zip(seq_fns, tasks)):
            for i in range(mc):
                p1, p2 = fn(st.params, st.model_state, image,
                            jax.random.key(m * 100 + i))
                acc = acc + p1.mean() + p2.mean()
        return acc

    t_seq = timed(sequential, x)
    print(f"sequential (member x pass loops): {t_seq*1e3:.1f} ms", flush=True)

    # --- fused production ensemble ----------------------------------------
    ens = Ensemble(paths, monte_carlo_steps=mc, return_raw_predictions=True)

    def fused(image):
        p1, p2 = ens.raw_forward(image, jax.random.key(0))
        return p1.mean() + p2.mean()

    t_fused = timed(fused, x)
    print(f"fused (stacked members, MC-in-batch): {t_fused*1e3:.1f} ms",
          flush=True)

    # member loop with MC folded into the batch (no weight batching)
    def member_loop(image):
        acc = 0.0
        for m, (task, st) in enumerate(tasks):
            p1, p2 = ens._member_fns[m](st.params, st.model_state, image,
                                        jax.random.key(m))
            acc = acc + p1.mean() + p2.mean()
        return acc

    t_loop = timed(member_loop, x)
    print(f"member-loop, MC-in-batch: {t_loop*1e3:.1f} ms", flush=True)
    print(f"speedup stacked: {t_seq/t_fused:.2f}x  "
          f"member-loop: {t_seq/t_loop:.2f}x", flush=True)


if __name__ == "__main__":
    main()
