"""Analytic roofline for the CURRENT default engine (VERDICT r4 #4).

Re-derives the honest throughput ceiling for the minkunet18 default at
the bench's measured capacities, from the kernel formulation itself:

  - every windowed conv costs GATHER dots (2*N*W*Cpad per offset) plus
    the weight GEMM (2*N*K*Cpad*Cout_pad) — and BOTH run at the measured
    narrow-N column-tile rate (~25 TF/s at <=128 output columns on this
    v5e; scripts/probe_gemm_nsweep.py round 3), NOT the 197 TF/s bf16
    MXU peak (512x512 blocks reach ~240 TF/s).
  - windows: table path W = T + 64, self-keyed W = T + 128 (T = 256).
  - fixed stages (voxelize, hierarchy sorts, cluster, pose/kp/icp) enter
    as measured wall times (probe_prod_stages / RESULTS r4 breakdown).

Prints the per-stage table + ceilings; no device needed (pure math).
Usage: python scripts/roofline_r5.py
"""

K3, K2 = 27, 8
RATE_NARROW = 25e12      # measured: <=128-col dots, any M (r3 column-tile law)
RATE_PEAK = 197e12       # v5e bf16 MXU peak (2x for int8)


def pad128(c):
    return max(128, -(-c // 128) * 128)


def unet18_convs(caps):
    """(name, level_rows, cin, cout, kind) for minkunet18 (PLANES
    (32,64,128,256,256,128,96,96), BasicBlock x2, INIT_DIM 32)."""
    l0, l1, l2, l3, l4 = caps
    P = (32, 64, 128, 256, 256, 128, 96, 96)
    out = [("conv0", l0, 3, 32, "k3")]
    enc_in = 32
    for i, lv in enumerate((l1, l2, l3, l4)):
        out.append((f"conv{i+1}s2", lv, enc_in, enc_in, "k2"))
        # block i: conv1 (enc_in -> P[i]) + conv2 (P[i] -> P[i]); rep 2
        out += [(f"block{i+1}a1", lv, enc_in, P[i], "k3"),
                (f"block{i+1}a2", lv, P[i], P[i], "k3"),
                (f"block{i+1}b1", lv, P[i], P[i], "k3"),
                (f"block{i+1}b2", lv, P[i], P[i], "k3")]
        enc_in = P[i]
    skips = (128, 64, 32)  # encoder widths at l2, l1, l0... (post-block)
    dec_lv = (l3, l2, l1, l0)
    skip_w = (128, 64, 32, 32)  # block3=128 @l3? see below
    # decoder: tr4 (256 -> 256) to l3, cat with block3 (128) -> 384
    dec = [("convtr4", l3, 256, P[4], "up")]
    cin = P[4] + 128
    dec += [("block5a1", l3, cin, P[4], "k3"), ("block5a2", l3, P[4], P[4], "k3"),
            ("block5b1", l3, P[4], P[4], "k3"), ("block5b2", l3, P[4], P[4], "k3")]
    dec += [("convtr5", l2, P[4], P[5], "up")]
    cin = P[5] + 64
    dec += [("block6a1", l2, cin, P[5], "k3"), ("block6a2", l2, P[5], P[5], "k3"),
            ("block6b1", l2, P[5], P[5], "k3"), ("block6b2", l2, P[5], P[5], "k3")]
    dec += [("convtr6", l1, P[5], P[6], "up")]
    cin = P[6] + 32
    dec += [("block7a1", l1, cin, P[6], "k3"), ("block7a2", l1, P[6], P[6], "k3"),
            ("block7b1", l1, P[6], P[6], "k3"), ("block7b2", l1, P[6], P[6], "k3")]
    dec += [("convtr7", l0, P[6], P[7], "up")]
    cin = P[7] + 32
    dec += [("block8a1", l0, cin, P[7], "k3"), ("block8a2", l0, P[7], P[7], "k3"),
            ("block8b1", l0, P[7], P[7], "k3"), ("block8b2", l0, P[7], P[7], "k3")]
    return out + dec


def conv_flops(n, cin, cout, kind, t=256, sk_levels=None, sk=False):
    """(gather_flops, gemm_flops) for one conv at capacity n."""
    cpad = pad128(cin)
    w = (t + 128) if sk else (t + 64)
    if kind == "k3":
        k_eff = K3 - 1 if not sk else K3 - 1   # identity offset is a copy
        gather = 2 * n * w * cpad * k_eff
        gemm = 2 * n * (K3 * cpad) * pad128(cout)
    elif kind == "k2":
        gather = 2 * n * w * cpad * K2
        gemm = 2 * n * (K2 * cpad) * pad128(cout)
    else:  # up: ONE union gather + wide GEMM (kg*cout columns)
        gather = 2 * n * w * cpad
        gemm = 2 * n * cpad * K2 * pad128(cout)
        return gather, gemm
    # channel groups replicate the GATHER over ceil(cin/128) groups is
    # already counted via cpad; multi-group only when cin > 128:
    return gather, gemm


def profile(name, caps, batch, fixed_ms, sk=True):
    convs = unet18_convs(caps)
    g_tot = m_tot = 0
    for cname, n, cin, cout, kind in convs:
        g, m = conv_flops(n, cin, cout, kind, sk=sk and kind == "k3")
        g_tot += g * batch
        m_tot += m * batch
    t_narrow = (g_tot + m_tot) / RATE_NARROW * 1e3
    t_peak = (g_tot + m_tot) / RATE_PEAK * 1e3
    gemm_only_peak = m_tot / RATE_PEAK * 1e3
    total_narrow = t_narrow + fixed_ms
    total_peak = gemm_only_peak + fixed_ms
    print(f"\n== {name}  (B={batch}, caps={caps})")
    print(f"  gather dot FLOPs: {g_tot/1e9:8.1f} G   "
          f"weight GEMM FLOPs: {m_tot/1e9:8.1f} G  "
          f"(gather overhead {g_tot/max(m_tot,1):.2f}x)")
    print(f"  U-Net @25TF/s narrow-N law : {t_narrow:7.1f} ms")
    print(f"  U-Net @MXU peak (197TF/s)  : {t_peak:7.1f} ms")
    print(f"  fixed stages (measured)    : {fixed_ms:7.1f} ms")
    print(f"  CEILING current formulation: {batch/ (total_narrow/1e3):7.1f} "
          f"clouds/s   (U-Net narrow-N + fixed)")
    print(f"  CEILING if gathers were free and GEMMs ran at peak: "
          f"{batch/(total_peak/1e3):7.1f} clouds/s")
    return batch / (total_narrow / 1e3)


if __name__ == "__main__":
    # headline: measured caps from bench.py occupancy probe (B=8/16k);
    # fixed = voxelize 4.7 + hier(sk) ~12 + cluster ~4 + pose/kp/icp ~33
    # (RESULTS r4 breakdown + r5 stage probe, scaled to B=8)
    profile("headline B=8/16k bf16", (12544, 10240, 6400, 2816, 1024),
            batch=8, fixed_ms=55.0)
    # production: fixed = vox 22 + hier 54 + cluster 13 + crop 6 +
    # pose/kp/icp 33 (probe_prod_stages, B=2)
    profile("production B=2/131k int8", (72448, 40704, 13568, 4352, 768),
            batch=2, fixed_ms=128.0)
