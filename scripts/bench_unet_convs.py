"""Per-conv profile of the 18D seg U-Net at real bench capacities.

Builds the real hierarchy from bench inputs, then times EVERY conv shape
the 18D net runs (k3 blocks per level, k2 downs, k2 transposes) on the
Pallas path, reporting ms, real conv GF, gather GF (the one-hot dots) and
effective TF/s.  This locates the 343 ms U-Net wall conv-by-conv.

Run alone on the TPU:  python scripts/bench_unet_convs.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from bench import build_inputs, measure_seg_caps

    from mrcc_tpu.geometry.preprocess import center_at_origin
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.impl import sparse_impl
    from mrcc_tpu.sparse import conv as C

    batch = int(os.environ.get("BENCH_BATCH", 8))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))
    pts, rgb, mask = build_inputs(batch, capacity)
    caps = measure_seg_caps(pts, rgb, mask)
    print(f"# caps {caps}  B={batch}")

    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    @jax.jit
    def prep(pts, rgb, mask):
        c, _ = center_at_origin(pts, mask=mask)
        vox, _, _ = voxelize(c, rgb, mask, 1 / 200.0, caps[0])
        return vox

    vox = prep(pts, rgb, mask)

    def build(vox):
        with sparse_impl("pallas"):
            return build_hierarchy(vox, 4, capacities=caps[1:])

    levels = jax.jit(build)(vox)
    levels = jax.tree_util.tree_map(lambda x: x, levels)  # realized

    # ---- the 18D conv inventory: (tag, kind, level_idx, cin, cout, count)
    # planes D = (32,64,128,256,384,384,384,384), layers (2,)*8, stem 32
    P = (32, 64, 128, 256, 384, 384, 384, 384)
    inv = []
    inv.append(("stem      k3 L0", "k3", 0, 3, 32, 1))
    # encoder downs: L0->1 (32->32), L1->2 (32->64)... conv then blocks
    enc_in = [32, 32, 64, 128]   # input to down conv at level l -> l+1
    for i in range(4):
        inv.append((f"down L{i}->{i+1}", "down", i, enc_in[i],
                    enc_in[i] if i == 0 else enc_in[i], 1))
    # Note: reference down convs keep channels (conv1p1s2: 32->32 etc) then
    # blocks change width.  block_l at level l+1 with planes[l]:
    blocks_in = [32, 32, 64, 128]
    for i in range(4):
        pl_ = P[i]
        # first block: in -> planes (conv1) + planes->planes (conv2);
        # second block: planes->planes x2
        inv.append((f"block{i+1} a  L{i+1}", "k3", i + 1, blocks_in[i], pl_, 1))
        inv.append((f"block{i+1} b  L{i+1}", "k3", i + 1, pl_, pl_, 3))
    # decoder: convtr (k2 up) from level 4-i to 3-i with planes[4+i]
    dec_in = [P[3], P[4], P[5], P[6]]       # 256? no: block4 out=256
    dec_in = [256, 384, 384, 384]
    skip = [128, 64, 32, 32]                # cat widths (block3,2,1,stem)
    for i in range(4):
        lvl = 3 - i
        inv.append((f"convtr L{lvl+1}->{lvl}", "up", lvl, dec_in[i], P[4 + i], 1))
        cat_in = P[4 + i] + skip[i]
        inv.append((f"block{5+i} a  L{lvl}", "k3", lvl, cat_in, P[4 + i], 1))
        inv.append((f"block{5+i} b  L{lvl}", "k3", lvl, P[4 + i], P[4 + i], 3))

    rng = np.random.default_rng(0)
    rows = []
    tot = 0.0
    tot_real = 0.0
    tot_gather = 0.0
    W_WIDTH = 256
    for tag, kind, li, cin, cout, count in inv:
        lv = levels[li]
        n = lv.key.shape[1]
        feats = jnp.asarray(rng.normal(size=(batch, n, cin)), jnp.bfloat16)
        if kind == "k3":
            k = 27
            wgt = jnp.asarray(rng.normal(size=(k, cin, cout)) / cin, jnp.float32)

            def f(feats, wgt, lv):
                with sparse_impl("pallas"):
                    return C.conv_k3(feats, wgt, lv)
            args = (feats, wgt, lv)
            hits = float(np.asarray(lv.nbr_hit.sum()))
        elif kind == "down":
            k = 8
            fine, coarse = levels[li], levels[li + 1]
            wgt = jnp.asarray(rng.normal(size=(k, cin, cout)) / cin, jnp.float32)

            def f(feats, wgt, fine, coarse):
                with sparse_impl("pallas"):
                    return C.conv_down(feats, wgt, fine, coarse)
            args = (feats, wgt, fine, coarse)
            hits = float(np.asarray(coarse.child_hit.sum()))
        else:  # up: coarse level li+1 -> fine li
            k = 8
            coarse, fine = levels[li + 1], levels[li]
            nc = coarse.key.shape[1]
            feats = jnp.asarray(rng.normal(size=(batch, nc, cin)), jnp.bfloat16)
            wgt = jnp.asarray(rng.normal(size=(k, cin, cout)) / cin, jnp.float32)

            def f(feats, wgt, coarse, fine):
                with sparse_impl("pallas"):
                    return C.conv_transpose_up(feats, wgt, coarse, fine)
            args = (feats, wgt, coarse, fine)
            hits = float(np.asarray(fine.valid.sum()))

        fn = jax.jit(f)
        try:
            dt = timeit(fn, args)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:18s} FAILED {str(e)[:100]}")
            continue
        n_out = (levels[li].key.shape[1] if kind != "down"
                 else levels[li + 1].key.shape[1])
        real_gf = 2 * hits * cin * cout / 1e9
        gather_gf = 2 * k * batch * n_out * W_WIDTH * cin / 1e9
        print(f"> {tag:18s} {dt*1e3:8.2f} ms", flush=True)
        rows.append((tag, count, dt, real_gf, gather_gf))
        tot += dt * count
        tot_real += real_gf * count
        tot_gather += gather_gf * count

    print(f"{'conv':18s} {'x':>2s} {'ms':>8s} {'realGF':>8s} {'gathGF':>8s} "
          f"{'TF/s(real)':>10s} {'ms*x':>8s}")
    for tag, count, dt, rgf, ggf in rows:
        print(f"{tag:18s} {count:2d} {dt*1e3:8.2f} {rgf:8.1f} {ggf:8.1f} "
              f"{rgf/dt/1e3:10.2f} {dt*count*1e3:8.1f}")
    print(f"\nTOTAL {tot*1e3:.1f} ms   real {tot_real/1e3:.2f} TF "
          f"(roofline {tot_real/200/1e3*1e3:.1f} ms @200TF/s)   "
          f"gather {tot_gather/1e3:.2f} TF")


if __name__ == "__main__":
    main()
