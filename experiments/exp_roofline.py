"""Eval-forward roofline table (flagship: B=128, 256px, S=2, fbc=21).

For each stage of the production eval path, computes analytic FLOPs and
minimal HBM bytes, the attainable time (max of compute at the measured
127 TF/s CT-dot ceiling / 197 TF/s XLA conv peak and memory at the
measured 850 GB/s 2D-block bandwidth), and compares with measured stage
times.  Measured numbers are pasted from the isolated-stage experiments
(exp_core_split.py, exp_kernel_attrib.py, exp_up3_ct.py) run this round;
re-run those to refresh.

Run (CPU fine): PYTHONPATH="" python experiments/exp_roofline.py
"""

B, S, F = 128, 2, 21
H = W = 256
FS = F * S

P1 = S * B * H * W            # full-res lane positions (per-subnet images)
P2 = S * B * (H // 2) * (W // 2)
Pb2 = B * (H // 2) * (W // 2)  # core images at half res
Pb4 = B * (H // 4) * (W // 4)

DOT_TFS = 127e12   # measured CT big-K dot ceiling (PERFORMANCE.md §2)
MXU_TFS = 197e12   # v5e bf16 peak
HBM_BS = 850e9     # measured 2D-block DMA bandwidth


def a8(n):
    return (n + 7) // 8 * 8


def ct_dc(c1, c2, m, o, pos, extra_out=0.0):
    """(GFLOP, GB) for a fused CT DoubleConv at `pos` lane positions."""
    cp = a8(c1) + (a8(c2) if c2 else 0)
    fl = 2 * (3 * cp) * (3 * a8(m)) * pos + 2 * (3 * a8(m)) * (3 * a8(o)) * pos
    by = (c1 + (c2 or 0)) * pos * 2 + a8(o) * pos * 2 * (1 + extra_out)
    return fl / 1e9, by / 1e9


def xla_conv(cin, cout, pos):
    fl = 2 * 9 * cin * cout * pos
    by = (cin + cout) * pos * 2
    return fl / 1e9, by / 1e9


def row(name, meas_ms, fl, by, ceil=DOT_TFS):
    att = max(fl * 1e9 / ceil, by * 1e9 / HBM_BS) * 1e3
    ach = fl * 1e9 / (meas_ms * 1e-3) / 1e12 if meas_ms else 0.0
    print(f"| {name:26s} | {meas_ms:6.2f} | {fl:7.0f} | {by:5.2f} | "
          f"{att:6.2f} | {ach:5.1f} | {meas_ms / att:4.1f}x |")


def main():
    print("| stage | meas ms | GFLOP | GB | attain ms | TF/s | gap |")
    print("|---|---|---|---|---|---|---|")
    # CT kernels (dots at the 127 TF/s measured ceiling)
    fl, by = ct_dc(3, 0, F, F, P1, extra_out=0.5)   # + fused hpool output
    row("in_conv CT (3-21-21)", 8.6, fl, by)
    fl, by = ct_dc(a8(F), 0, 2 * F, 2 * F, P2)
    row("down1 CT (24-42-42)", 4.50, fl, by)
    fl, by = ct_dc(S * a8(2 * F), a8(2 * FS), 2 * FS, FS, Pb2)
    row("up3 CT (96+88-84-42)", 7.43, fl, by)
    fl, by = ct_dc(a8(F), a8(FS), (F + FS) // 2, F, P1)
    row("decoder CT (24+48-31-21)", 13.48, fl, by)

    # XLA core blocks (conv peak; block times include pool/upsample/BN)
    fl1, by1 = xla_conv(2 * FS, 4 * FS, Pb4)
    fl2, by2 = xla_conv(4 * FS, 4 * FS, Pb4)
    row("down2 XLA (84-168-168)", 8.34, fl1 + fl2, by1 + by2, MXU_TFS)
    fl1, by1 = xla_conv(4 * FS, 8 * FS, Pb4 // 4)
    fl2, by2 = xla_conv(8 * FS, 8 * FS, Pb4 // 4)
    row("down3 XLA (168-336-336)", 2.81, fl1 + fl2, by1 + by2, MXU_TFS)
    fl1, by1 = xla_conv(8 * FS, 8 * FS, Pb4 // 16)
    fl2, by2 = xla_conv(8 * FS, 8 * FS, Pb4 // 16)
    row("down4 XLA (336-336)", 0.75, fl1 + fl2, by1 + by2, MXU_TFS)
    fl1, by1 = xla_conv(16 * FS, 8 * FS, Pb4 // 4)
    fl2, by2 = xla_conv(8 * FS, 4 * FS, Pb4 // 4)
    row("up1 XLA (672-336-168)", 5.40, fl1 + fl2, by1 + by2, MXU_TFS)
    fl1, by1 = xla_conv(8 * FS, 4 * FS, Pb4)
    fl2, by2 = xla_conv(4 * FS, 2 * FS, Pb4)
    row("up2 XLA (336-168-84)", 6.96, fl1 + fl2, by1 + by2, MXU_TFS)

    # boundary / glue passes (memory-bound by construction)
    up_by = (a8(2 * FS) * Pb4 * 2 * 3 + a8(2 * FS) * Pb2 * 2 * 2) / 1e9
    row("up3 CT upsample", 3.43, 0.1, up_by)
    dec_by = (a8(FS) * Pb2 * 2 * 3 + a8(FS) * 4 * Pb2 * 2 * 2) / 1e9
    row("decoder CT upsample", 4.38, 0.1, dec_by)
    pool_by = (S * a8(2 * F) * Pb2 * 2 * 1.25) / 1e9
    row("core CT pool", 2.29, 0.0, pool_by)
    wp_by = (a8(F) * P1 * 2 * 0.75) / 1e9
    row("down1 W-pool (sel-matmul)", 2.01, 0.0, wp_by)


if __name__ == "__main__":
    main()
