"""ROS PointCloud2 <-> numpy conversion (vendored minimal subset).

Parity: /root/reference/utils/ros_utils.py (ros_numpy vendored).  Works on
raw message fields so it does not import rospy at module level.
"""

from __future__ import annotations

import struct

import numpy as np

_DATATYPES = {
    1: ("b", 1), 2: ("B", 1), 3: ("h", 2), 4: ("H", 2),
    5: ("i", 4), 6: ("I", 4), 7: ("f", 4), 8: ("d", 8),
}


def pointcloud2_to_arrays(msg, skip_nans=True):
    """PointCloud2 -> (points [N,3] float32, rgb [N,3] float32 in [0,1]).

    Expects x/y/z float32 fields and a packed ``rgb`` float32 field (the
    Kinect registered-cloud layout the reference consumes)."""
    offsets = {f.name: f.offset for f in msg.fields}
    step = msg.point_step
    n = msg.width * msg.height
    raw = np.frombuffer(bytes(msg.data), dtype=np.uint8).reshape(n, step)

    def field_f32(name):
        off = offsets[name]
        return raw[:, off:off + 4].copy().view(np.float32)[:, 0]

    x, y, z = field_f32("x"), field_f32("y"), field_f32("z")
    points = np.stack([x, y, z], axis=1)

    if "rgb" in offsets:
        packed = raw[:, offsets["rgb"]:offsets["rgb"] + 4].copy().view(
            np.uint32)[:, 0]
        r = ((packed >> 16) & 0xFF).astype(np.float32) / 255.0
        g = ((packed >> 8) & 0xFF).astype(np.float32) / 255.0
        b = (packed & 0xFF).astype(np.float32) / 255.0
        rgb = np.stack([r, g, b], axis=1)
    else:
        rgb = np.zeros_like(points)

    if skip_nans:
        ok = np.isfinite(points).all(axis=1)
        points, rgb = points[ok], rgb[ok]
    return points.astype(np.float32), rgb


def arrays_to_pointcloud2_data(points, rgb):
    """Inverse packing (for tests / publishing): returns (data bytes,
    point_step, fields spec tuples)."""
    n = len(points)
    step = 16
    raw = np.zeros((n, step), np.uint8)
    raw[:, 0:12] = points.astype(np.float32).view(np.uint8).reshape(n, 12)
    packed = ((np.clip(rgb[:, 0] * 255, 0, 255).astype(np.uint32) << 16)
              | (np.clip(rgb[:, 1] * 255, 0, 255).astype(np.uint32) << 8)
              | np.clip(rgb[:, 2] * 255, 0, 255).astype(np.uint32))
    raw[:, 12:16] = packed.view(np.uint32)[:, None].view(np.uint8).reshape(n, 4)
    fields = (("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("rgb", 12, 7))
    return raw.tobytes(), step, fields
