"""Synthetic labelled RGB-D scenes (Franka-hand-like EE + arm + background).

The reference ships sample pickles (dataset/sample/labeled/{1..5}.pickle,
README.md:3) that are git-LFS-missing in this environment, so the rebuild
generates its own self-consistent samples with the same schema
(README.md:53-62): ``{points Nx3, rgb Nx3, labels N (0 bg/1 arm/2 ee),
instance_labels, pose 7 (x,y,z,qx,qy,qz,qw XYZW!), joint_angles 9}``.

The EE geometry follows the canonical keypoint template
(mrcc_tpu.data.labels.KEY_POINTS_6/10): a palm plate spanning
x∈[-0.022,0.02], y∈[-0.1,0.1], z∈[0,0.07] plus two finger boxes around
y=±0.048 reaching z=0.12 — so the geometric keypoint labellers and the
ICP CAD template find the same structure a real Franka hand would give.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ..geometry.quaternion import EPS  # noqa: F401  (doc cross-link)
from .labels import quat_to_matrix_np


def _box_surface(rng, lo, hi, n):
    """Sample n points uniformly on the surface of an axis-aligned box."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    size = hi - lo
    areas = np.array([
        size[1] * size[2], size[1] * size[2],
        size[0] * size[2], size[0] * size[2],
        size[0] * size[1], size[0] * size[1],
    ])
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u, v = rng.random(n), rng.random(n)
    pts = np.empty((n, 3))
    for f in range(6):
        m = face == f
        axis = f // 2
        side = f % 2
        a, b = [i for i in range(3) if i != axis]
        pts[m, axis] = lo[axis] if side == 0 else hi[axis]
        pts[m, a] = lo[a] + u[m] * size[a]
        pts[m, b] = lo[b] + v[m] * size[b]
    return pts


def _cylinder_surface(rng, p0, p1, radius, n):
    """Sample points on the lateral surface of a cylinder from p0 to p1."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    axis = axis / length
    # orthonormal frame
    ref = np.array([0.0, 0.0, 1.0]) if abs(axis[2]) < 0.9 else np.array([1.0, 0, 0])
    u = np.cross(axis, ref)
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    t = rng.random(n) * length
    ang = rng.random(n) * 2 * np.pi
    return (p0[None] + t[:, None] * axis[None]
            + radius * np.cos(ang)[:, None] * u[None]
            + radius * np.sin(ang)[:, None] * v[None])


def ee_template_points(rng, n=4096):
    """EE surface points in the canonical EE frame (z along approach axis).

    Deliberately asymmetric like the real Franka hand (one-sided cable fin +
    wrist collar): a centro-symmetric gripper makes the orientation
    unlearnable and gives ICP a spurious 180°-flipped minimum.
    """
    n_palm = int(n * 0.5)
    n_f = int(n * 0.14)
    n_wrist = int(n * 0.12)
    n_fin = n - n_palm - 2 * n_f - n_wrist
    palm = _box_surface(rng, [-0.022, -0.1, 0.0], [0.02, 0.1, 0.07], n_palm)
    f_l = _box_surface(rng, [-0.01, 0.038, 0.07], [0.01, 0.058, 0.12], n_f)
    f_r = _box_surface(rng, [-0.01, -0.058, 0.07], [0.01, -0.038, 0.12], n_f)
    # wrist collar below the palm (z < 0): breaks z-translation symmetry
    wrist = _cylinder_surface(rng, [0, 0, -0.045], [0, 0, 0.0], 0.032, n_wrist)
    # one-sided cable fin under the +y flank: breaks the 180° y/x symmetry
    # (kept shallow so the palm corners remain the extreme points the
    # 6-keypoint labeller snaps to)
    fin = _box_surface(rng, [-0.022, 0.055, -0.02], [0.02, 0.08, -0.005],
                       n_fin)
    return np.concatenate([palm, f_l, f_r, wrist, fin])


def random_pose(rng, dist_range=(0.6, 1.4)):
    """A random EE pose in the camera frame (WXYZ), camera looking at +z."""
    # position in front of the camera
    pos = np.array([
        rng.uniform(-0.35, 0.35),
        rng.uniform(-0.25, 0.25),
        rng.uniform(*dist_range),
    ])
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return np.concatenate([pos, q])


def generate_sample(seed=0, n_ee=4096, n_arm=6000, n_bg=14000,
                    noise=0.0015, ee2base_dist=0.75):
    """One labelled scene in the reference pickle schema (pose is XYZW)."""
    rng = np.random.default_rng(seed)
    pose = random_pose(rng)  # WXYZ, camera frame
    rot = quat_to_matrix_np(pose[3:])

    ee_local = ee_template_points(rng, n_ee)
    ee_pts = ee_local @ rot.T + pose[:3]

    # arm: two cylinder links ending at the EE mount (palm back, z=0 plane)
    mount = pose[:3] + rot @ np.array([0.0, 0.0, -0.01])
    elbow = mount + rng.normal(size=3) * 0.05 + np.array([0.15, 0.1, 0.1])
    base = np.array([0.55, 0.35, 1.1]) + rng.normal(size=3) * 0.03
    link1 = _cylinder_surface(rng, base, elbow, 0.045, n_arm // 2)
    link2 = _cylinder_surface(rng, elbow, mount, 0.035, n_arm - n_arm // 2)
    arm_pts = np.concatenate([link1, link2])

    # background: table plane + clutter boxes.  The table is a true PLANE
    # (plus ~2mm sensor noise) — a depth camera sees surfaces; a volumetric
    # slab here would be unrealistic and would destroy the stride-2 voxel
    # coalescing every sparse U-Net level relies on.
    n_table = int(n_bg * 0.7)
    table = np.stack([
        rng.uniform(-0.9, 0.9, n_table),
        0.43 + rng.normal(0.0, 0.002, n_table),
        rng.uniform(0.5, 1.9, n_table),
    ], axis=1)
    clutter = []
    remaining = n_bg - n_table
    for _ in range(4):
        c = np.array([rng.uniform(-0.7, 0.7), rng.uniform(0.1, 0.35),
                      rng.uniform(0.7, 1.7)])
        s = rng.uniform(0.04, 0.12, size=3)
        clutter.append(_box_surface(rng, c - s, c + s, remaining // 4))
    bg_pts = np.concatenate([table] + clutter)[:n_bg]

    points = np.concatenate([bg_pts, arm_pts, ee_pts]).astype(np.float32)
    labels = np.concatenate([
        np.zeros(len(bg_pts)), np.ones(len(arm_pts)),
        np.full(len(ee_pts), 2.0),
    ]).astype(np.float32)
    instance_labels = labels.copy()

    points = points + rng.normal(size=points.shape).astype(np.float32) * noise

    rgb = np.empty_like(points)
    rgb[labels == 0] = rng.uniform(0.2, 0.9, (int((labels == 0).sum()), 3))
    rgb[labels == 1] = rng.uniform(0.75, 0.95, (int((labels == 1).sum()), 3))
    # EE colors keyed to the local geometry (the real hand's printed shell /
    # cable side look different per face) — gives nets an orientation cue
    ee_l = ee_local - ee_local.min(0)
    ee_l = ee_l / np.maximum(ee_l.max(0), 1e-9)
    rgb[labels == 2] = (0.08 + 0.25 * ee_l
                        + rng.normal(size=ee_l.shape) * 0.02)
    rgb = np.clip(rgb, 0.0, 1.0).astype(np.float32)

    perm = rng.permutation(len(points))
    points, rgb, labels = points[perm], rgb[perm], labels[perm]
    instance_labels = instance_labels[perm]

    # ee2base pose ("/robot/ee_pose"): EE pose in the robot base frame.
    # Derived from a fixed synthetic base2cam extrinsic so that
    # base2cam(ee_pose_cam, ee2base) is constant across samples.
    base2cam = gt_base2cam_pose()
    ee2base = _ee_pose_in_base(pose, base2cam)

    pose_xyzw = np.concatenate([pose[:3], pose[4:], pose[3:4]])  # WXYZ->XYZW
    return {
        "points": points,
        "rgb": rgb,
        "labels": labels,
        "instance_labels": instance_labels,
        "pose": pose_xyzw.astype(np.float32),
        "joint_angles": rng.uniform(-1.5, 1.5, 9).astype(np.float32),
        "ee2base_pose": ee2base.astype(np.float32),  # WXYZ
    }


def gt_base2cam_pose():
    """The synthetic ground-truth camera-to-robot-base extrinsic (WXYZ).

    Plays the role of TEST.gt_base_to_cam_pose (config/default.yaml:126).
    """
    return np.array([0.645, 0.408, 0.994, 0.656, 0.2964, 0.2756, -0.6299])


def _pose_to_mat(pose):
    m = np.eye(4)
    m[:3, :3] = quat_to_matrix_np(pose[3:7])
    m[:3, 3] = pose[:3]
    return m


def _mat_to_pose(m):
    """Pure-numpy 4x4 -> [pos, WXYZ] (branching Shepperd).

    The jax ``matrix_to_pose`` here cost a ~0.5 s device round-trip PER
    SAMPLE (and deadlocked sample generation whenever another process held
    the chip) — the data generator must never touch the accelerator."""
    m = np.asarray(m, np.float64)
    r = m[:3, :3]
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                      (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        q = np.array([(r[2, 1] - r[1, 2]) / s, 0.25 * s,
                      (r[0, 1] + r[1, 0]) / s, (r[0, 2] + r[2, 0]) / s])
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        q = np.array([(r[0, 2] - r[2, 0]) / s, (r[0, 1] + r[1, 0]) / s,
                      0.25 * s, (r[1, 2] + r[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        q = np.array([(r[1, 0] - r[0, 1]) / s, (r[0, 2] + r[2, 0]) / s,
                      (r[1, 2] + r[2, 1]) / s, 0.25 * s])
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return np.concatenate([m[:3, 3], q]).astype(np.float32)


def _ee_pose_in_base(ee_cam_pose, base2cam):
    """ee2base = inv(base2cam) @ ee2cam."""
    m = np.linalg.inv(_pose_to_mat(base2cam)) @ _pose_to_mat(ee_cam_pose)
    return _mat_to_pose(m)


def write_sample_set(out_dir, n=5, seed0=1, **kw):
    """Write n sample pickles + a split JSON mirroring others/*.json."""
    out_dir = Path(out_dir)
    (out_dir / "labeled").mkdir(parents=True, exist_ok=True)
    entries = []
    for i in range(n):
        sample = generate_sample(seed=seed0 + i, **kw)
        path = out_dir / "labeled" / f"{i + 1}.pickle"
        with open(path, "wb") as f:
            pickle.dump(sample, f)
        entries.append({
            "filepath": str(path),
            "position": f"p{i % 3 + 1}",
            "light": "bright",
            "arm_point_count": int((sample["labels"] == 1).sum()),
            "position_eligibility": True,
            "orientation_eligibility": True,
        })
    splits = {"train": entries[:-2] or entries,
              "val": entries[-2:-1] or entries,
              "test": entries[-1:] or entries}
    import json

    with open(out_dir / "sample_splits.json", "w") as f:
        json.dump(splits, f, indent=2)
    return splits
