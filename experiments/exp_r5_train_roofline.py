"""Train-step roofline (flagship: B=128, 256px, S=2, fbc=21, bf16).

Two complementary views:

1. **Empirical** (``--trace /tmp/jax_trace_train``): per-bucket measured
   device time from a jax.profiler trace (capture with
   ``python experiments/exp_trace_train.py 128``), with per-op attainable
   = max(model_flops / 127 TF/s, bytes_accessed / 850 GB/s) summed per
   bucket.  XLA ops carry flops/bytes in the trace args; Pallas kernels
   do not (their attainable comes from view 2).  This view prices the
   gap *at the current traffic* — a small empirical gap with a large
   analytic gap means the op is fast but moves avoidable bytes.

2. **Analytic**: minimal-traffic FLOP/byte cost per stage against the
   measured ceilings (127 TF/s big-K CT dot, 850 GB/s HBM combined,
   docs/PERFORMANCE.md).  CT dw rows are MXU output-tile fill-limited
   (M = 3*cp, N = 3*oa taps-block, K = tile lanes), modeled with a
   sublane-granular M fill — calibrated to the round-5 trace (within
   ~20% per row).  XLA core conv rows use flops/127 directly (the
   round-5 trace shows the top core convs sustain 100-127 TF/s).

Run (CPU fine): PYTHONPATH="" python experiments/exp_r5_train_roofline.py \
    [--trace /tmp/jax_trace_train]
"""

import math
import sys

B, S, F = 128, 2, 21
H = W = 256
FS = F * S

P1 = S * B * H * W          # full-res per-subnetwork positions
P2 = S * B * (H // 2) * (W // 2)
Pb2 = B * (H // 2) * (W // 2)
Pb4 = B * (H // 4) * (W // 4)
Pb8 = B * (H // 8) * (W // 8)
Pb16 = B * (H // 16) * (W // 16)

DOT_TFS = 127e12
HBM_BS = 850e9


def a8(n):
    return (n + 7) // 8 * 8


def dot_fill(m, n):
    """MXU efficiency for a [m, K] x [K, n] dot with huge K: the systolic
    array streams K at a rate set by how full the 128x128 output tile is.
    M granularity is 8 sublanes (measured: dw kernels with M=24..96 beat
    the naive M/128 model ~2x)."""
    me = max(m, 64) / (math.ceil(m / 128) * 128)
    ne = n / (math.ceil(n / 128) * 128)
    return me * ne


ROWS = []


def row(name, gflop, gb, eff=1.0, meas=None):
    attain = max(gflop * 1e9 / (DOT_TFS * eff), gb * 1e9 / HBM_BS) * 1e3
    ROWS.append((name, meas, gflop, gb, attain))
    return attain


def kn_fill(k, n):
    """Small-K/N dot efficiency (K and N fill against 128), the model the
    round-3 eval roofline calibrated for the fwd/dx kernels."""
    ke = k / (math.ceil(k / 128) * 128)
    ne = n / (math.ceil(n / 128) * 128)
    return ke * ne


def ct_fwd(name, c1, c2, o, pos, meas=None):
    """Train fwd kernel: one dot K=3cp N=3oa + combine + stats."""
    cp = a8(c1) + (a8(c2) if c2 else 0)
    oa = a8(o)
    gf = 2 * 3 * cp * 3 * oa * pos / 1e9
    gb = ((c1 + (c2 or 0)) * pos * 2 + oa * pos * 2) / 1e9
    return row(name, gf, gb, kn_fill(3 * cp, 3 * oa), meas)


def ct_dx(name, c1, c2, o, pos, meas=None):
    """dx kernel: dot K=3oa N=3cp + 5-term combine (+prologue bwd)."""
    cp = a8(c1) + (a8(c2) if c2 else 0)
    oa = a8(o)
    gf = 2 * 3 * oa * 3 * cp * pos / 1e9
    gb = (oa * pos * 2 + cp * pos * 2) / 1e9
    return row(name, gf, gb, kn_fill(3 * oa, 3 * cp), meas)


def ct_dw(name, c1, c2, o, pos, meas=None):
    """dw kernel: rebuild cols + dot contracting the lane axis
    (M=3cp, N=3oa, K=th*w) — MXU output-tile fill limited."""
    cp = a8(c1) + (a8(c2) if c2 else 0)
    oa = a8(o)
    gf = 2 * 3 * cp * 3 * oa * pos / 1e9
    gb = ((c1 + (c2 or 0)) * pos * 2 + oa * pos * 2) / 1e9
    return row(name, gf, gb, dot_fill(3 * cp, 3 * oa), meas)


def g_eff(name, o, pos, meas=None):
    """g_eff_ct: read dy + y, write g (memory-speed)."""
    oa = a8(o)
    gb = 3 * oa * pos * 2 / 1e9
    return row(name, 0.0, gb, 1.0, meas)


def mem(name, gb, meas=None):
    return row(name, 0.0, gb, 1.0, meas)


def xla_conv(name, cin, cout, pos, meas=None):
    """XLA NHWC conv f+b: 3x fwd FLOPs at the 127 TF/s practical ceiling
    (trace-verified: top core convs sustain 100-127)."""
    gf = 3 * 2 * 9 * cin * cout * pos / 1e9
    gb = 3 * (cin + cout) * pos * 2 / 1e9
    return row(name, gf, gb, 1.0, meas)


def analytic(meas=None):
    meas = meas or {}
    f, f2 = F, 2 * F
    dec_c2 = 2 * FS // 2          # 42
    mid = (F + dec_c2) // 2       # 31
    g = meas.get

    print("-- CT forward --")
    ct_fwd("inconv.c1 fwd", 3, 0, f, P1, g("CT inconv.c1 fwd"))
    ct_fwd("inconv.c2 fwd", a8(f), 0, f, P1, g("CT inconv.c2 fwd"))
    ct_fwd("down1.c1 fwd", a8(f), 0, f2, P2, g("CT down1.c1 fwd"))
    ct_fwd("down1.c2 fwd", a8(f2), 0, f2, P2, g("CT down1.c2 fwd"))
    ct_fwd("dec.c1 fwd", a8(f), a8(dec_c2), mid, P1, g("CT dec.c1 fwd"))
    ct_fwd("dec.c2 fwd", a8(mid), 0, f, P1, g("CT dec.c2 fwd"))
    flush()

    print("-- CT backward (dx; inconv.c1 dx not needed) --")
    ct_dx("inconv.c2 dx", a8(f), 0, f, P1, g("CT inconv.c2 dx"))
    ct_dx("down1.c1 dx", a8(f), 0, f2, P2, g("CT down1.c1 dx"))
    ct_dx("down1.c2 dx", a8(f2), 0, f2, P2, g("CT down1.c2 dx"))
    ct_dx("dec.c1 dx(fold)", a8(f), a8(dec_c2), mid, P1, g("CT dec.c1 dx"))
    ct_dx("dec.c2 dx", a8(mid), 0, f, P1, g("CT dec.c2 dx"))
    flush()

    print("-- CT backward (dw; output-tile fill-limited) --")
    ct_dw("inconv.c1 dw", 3, 0, f, P1, g("CT inconv.c1 dw"))
    ct_dw("inconv.c2 dw", a8(f), 0, f, P1, g("CT inconv.c2 dw"))
    ct_dw("down1.c1 dw", a8(f), 0, f2, P2, g("CT down1.c1 dw"))
    ct_dw("down1.c2 dw", a8(f2), 0, f2, P2, g("CT down1.c2 dw"))
    ct_dw("dec.c1 dw", a8(f), a8(dec_c2), mid, P1, g("CT dec.c1 dw"))
    ct_dw("dec.c2 dw", a8(mid), 0, f, P1, g("CT dec.c2 dw"))
    flush()

    print("-- statistics folds (g_eff: dy+y -> g, 3 memory passes) --")
    g_eff("g_eff x6 sites", 0, 0)
    ROWS[-1] = ("g_eff x6 sites", g("CT g_eff"), 0.0,
                (3 * (a8(f) * P1 * 3 + a8(f2) * P2 * 2 + a8(mid) * P1) * 2)
                / 1e9, 0.0)
    n, m, fl, gb, _ = ROWS[-1]
    ROWS[-1] = (n, m, fl, gb, gb * 1e9 / HBM_BS * 1e3)
    flush()

    print("-- XLA core convs f+b (at the 127 TF/s practical ceiling) --")
    core = [
        ("down2.c1", 2 * FS, 4 * FS, Pb4), ("down2.c2", 4 * FS, 4 * FS, Pb4),
        ("down3.c1", 4 * FS, 8 * FS, Pb8), ("down3.c2", 8 * FS, 8 * FS, Pb8),
        ("down4.c1", 8 * FS, 8 * FS, Pb16), ("down4.c2", 8 * FS, 8 * FS, Pb16),
        ("up1.c1", 16 * FS, 8 * FS, Pb8), ("up1.c2", 8 * FS, 4 * FS, Pb8),
        ("up2.c1", 8 * FS, 4 * FS, Pb4), ("up2.c2", 4 * FS, 2 * FS, Pb4),
        ("up3.c1", 4 * FS, 2 * FS, Pb2), ("up3.c2", 2 * FS, FS, Pb2),
    ]
    xm = g("XLA conv")
    for i, (name, cin, cout, pos) in enumerate(core):
        xla_conv(name + " f+b", cin, cout, pos,
                 xm if i == len(core) - 1 else None)
    # attribute the single measured bucket to the section total line
    flush(section_meas=xm)

    print("-- pools / upsamples / elementwise (memory floors) --")
    mem("enc pool f+b", (a8(f2) * P2 * 2 * 5.0) / 1e9, g("pool"))
    mem("core pools f+b", (a8(f2) * S * Pb2 * 2 * 5.0) / 1e9)
    mem("dec upsample f+b", (a8(dec_c2) * P1 // S * 2 * 3.0) / 1e9,
        g("ct-upsample"))
    mem("affine/prelu", (a8(F) * P1 * 2 * 6.0) / 1e9, g("affine"))
    mem("outconv 1x1 f+b", (a8(F) * P1 * 2 * 3.0) / 1e9, g("outconv"))
    mem("skip cotangent adds", (a8(f) * P1 * 2 * 3.0 * 1.5) / 1e9,
        g("cotangent add"))
    mem("loss+opt+bn+metrics glue", 6.0, g("glue"))
    flush()

    tot_m = sum(m for _, m, _, _, _ in TOTAL if m)
    tot_a = sum(a for _, _, _, _, a in TOTAL)
    print(f"\nanalytic attainable total: {tot_a:.1f} ms "
          f"-> {B / tot_a * 1e3:.0f} img/s design ceiling"
          f"   (measured buckets sum: {tot_m:.1f} ms)")


TOTAL = []


def flush(section_meas=None):
    global ROWS
    for name, m, gf, gb, att in ROWS:
        ms = f"{m:7.2f}" if m is not None else "      —"
        gap = f"{m / att:4.1f}x" if (m and att) else ""
        print(f"  {name:26s} {ms} {gf:8.1f} {gb:6.2f} {att:8.2f} {gap}")
    if section_meas is not None:
        s = sum(att for _, _, _, _, att in ROWS)
        print(f"  {'  section total':26s} {section_meas:7.2f} "
              f"{'':8s} {'':6s} {s:8.2f} {section_meas / s:4.1f}x")
    TOTAL.extend(ROWS)
    ROWS = []


def parse_trace(logdir):
    """Bucketed per-step measured ms + per-op empirical attainable."""
    import glob
    import gzip
    import json
    import re
    from collections import defaultdict

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    steps, ops = [], {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_names.get(e.get("pid"))
        tn = tid_names.get((e.get("pid"), e.get("tid")))
        if pn != "/device:TPU:0":
            continue
        if tn == "Steps":
            steps.append(e.get("dur", 0) / 1e3)
        if tn != "XLA Ops":
            continue
        n = e["name"]
        if n not in ops:
            ops[n] = [0.0, e.get("args", {}) or {}]
        ops[n][0] += e.get("dur", 0) / 1e3

    stage_map = {
        (3, 0, 21): 'inconv.c1', (24, 0, 21): 'inconv.c2',
        (3, 0, 24): 'inconv.c1', (24, 0, 24): 'inconv.c2',
        (24, 0, 42): 'down1.c1', (48, 0, 42): 'down1.c2',
        (24, 0, 48): 'down1.c1', (48, 0, 48): 'down1.c2',
        (24, 48, 31): 'dec.c1', (24, 48, 32): 'dec.c1',
        (32, 0, 21): 'dec.c2', (32, 0, 24): 'dec.c2',
    }

    def bucket(name, a):
        src = str(a.get("tf_op") or "")
        m = re.search(r'(tr_fwd|tr_dx|tr_dxfold|tr_dw)_c(\d+)x(\d+)o(\d+)',
                      name)
        if m:
            k = {'tr_fwd': 'fwd', 'tr_dx': 'dx', 'tr_dxfold': 'dx',
                 'tr_dw': 'dw'}[m.group(1)]
            st = stage_map.get(
                (int(m.group(2)), int(m.group(3)), int(m.group(4))), '?')
            return f'CT {st} {k}'
        if 'g_eff' in name:
            return 'CT g_eff'
        if 'pool' in name:
            return 'pool'
        if 'affine_relu' in name:
            return 'affine'
        if 'conv1x1_prelu' in name:
            return 'outconv'
        if ('up2_ct' in name or 'upsample' in name or 'lerp' in name
                or 'w2x' in name):
            return 'ct-upsample'
        if "convolution" in a.get("hlo_category", ""):
            return 'XLA conv'
        if 'reduce_window' in src:
            return 'pool'
        if 'add_any' in src:
            return 'cotangent add'
        return 'glue'

    nsteps = max(len(steps), 1)
    meas = defaultdict(float)
    emp_att = defaultdict(float)
    for n, (d, a) in ops.items():
        b = bucket(n, a)
        meas[b] += d / nsteps
        fl = float(a.get("model_flops", 0) or 0)
        by = float(a.get("bytes_accessed", 0) or 0)
        emp_att[b] += max(fl / DOT_TFS, by / HBM_BS) * 1e3

    step_ms = sum(steps) / nsteps if steps else sum(meas.values())
    print(f"== trace {logdir}: step = {step_ms:.1f} ms "
          f"({B / step_ms * 1e3:.0f} img/s) ==")
    print(f"{'bucket':22s} {'meas':>7s} {'emp.att':>8s}  "
          f"(emp.att: per-op max(flops/127T, bytes/850G); Pallas ops "
          f"carry no flops/bytes)")
    for b, m in sorted(meas.items(), key=lambda kv: -kv[1]):
        ea = emp_att[b]
        print(f"{b:22s} {m:7.2f} {ea:8.2f}")
    print()
    return meas


def main():
    meas = {}
    if "--trace" in sys.argv:
        meas = parse_trace(sys.argv[sys.argv.index("--trace") + 1])
    print(f"  {'stage':26s} {'meas ms':>7s} {'GFLOP':>8s} {'GB':>6s} "
          f"{'attain':>8s}  gap")
    analytic(meas)


if __name__ == "__main__":
    main()
