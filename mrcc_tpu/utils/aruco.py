"""ArUco marker-based EE pose baseline (classical cross-check).

Parity: /root/reference/utils/aruco.py:35-113 — project the RGB-D cloud to
an image, detect a single ArUco tag, lift its 4 corners to 3D via the depth
buffer, Kabsch against the canonical tag corners, offset by t_tag2ee.

The reference uses Open3D's ``project_to_rgbd_image``; here the pinhole
projection + z-buffer is done directly in numpy (Open3D not available).
cv2 is required only for marker detection (import guarded).
"""

from __future__ import annotations

import numpy as np

from ..data.labels import quat_to_matrix_np
from ..geometry.kabsch import kabsch
from ..geometry.transform import matrix_to_quat

CAMERA_MATRIX_DEFAULT = np.array([
    [520.342706004118, 0, 323.0580496437712],
    [0, 513.826209565285, 263.4994539787398],
    [0, 0, 1],
])  # kinect1 rgb (aruco.py:16)


def project_to_rgbd(points, rgb, camera_matrix, width=640, height=480,
                    depth_max=4.0):
    """Pinhole projection with a z-buffer -> (rgb_img [H,W,3], depth [H,W])."""
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    z = points[:, 2]
    ok = (z > 1e-6) & (z < depth_max)
    u = np.round(points[:, 0] * fx / z + cx).astype(np.int64)
    v = np.round(points[:, 1] * fy / z + cy).astype(np.int64)
    ok &= (u >= 0) & (u < width) & (v >= 0) & (v < height)
    u, v, z = u[ok], v[ok], z[ok]
    col = rgb[ok]
    order = np.argsort(-z)  # draw far-to-near so near pixels win
    u, v, z, col = u[order], v[order], z[order], col[order]
    rgb_img = np.zeros((height, width, 3), np.float32)
    depth = np.zeros((height, width), np.float32)
    rgb_img[v, u] = col
    depth[v, u] = z
    return rgb_img, depth


def compute_ee_pose(points, rgb, camera_matrix=CAMERA_MATRIX_DEFAULT,
                    image_width=640, image_height=480,
                    aruco_tag_size=0.075, t_tag2ee=(-0.012, -0.0, -0.05)):
    """Detect the tag and return the EE pose [x,y,z,qw,qx,qy,qz] or None."""
    try:
        import cv2
    except ImportError:
        return None

    rgb01 = rgb if rgb.max() <= 1.5 else rgb / 255.0
    rgb_img, depth_img = project_to_rgbd(points, rgb01, camera_matrix,
                                         image_width, image_height)
    gray = cv2.cvtColor((rgb_img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)

    if hasattr(cv2.aruco, "getPredefinedDictionary"):
        aruco_dict = cv2.aruco.getPredefinedDictionary(
            cv2.aruco.DICT_6X6_1000)
        if hasattr(cv2.aruco, "ArucoDetector"):
            detector = cv2.aruco.ArucoDetector(
                aruco_dict, cv2.aruco.DetectorParameters())
            corners, ids, _ = detector.detectMarkers(gray)
        else:
            corners, ids, _ = cv2.aruco.detectMarkers(
                gray, aruco_dict, parameters=cv2.aruco.DetectorParameters())
    else:  # very old cv2 API (reference's)
        aruco_dict = cv2.aruco.Dictionary_get(cv2.aruco.DICT_6X6_1000)
        corners, ids, _ = cv2.aruco.detectMarkers(
            gray, aruco_dict, parameters=cv2.aruco.DetectorParameters_create())

    if corners is None or len(corners) != 1:
        return None

    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    corners_3d = []
    for i in range(4):
        u, v = corners[0][0][i]
        u, v = int(u), int(v)
        z = depth_img[v, u]
        if z <= 0:
            return None
        corners_3d.append([(u - cx) * z / fx, (v - cy) * z / fy, z])
    corners_3d = np.asarray(corners_3d, np.float32)

    half = aruco_tag_size / 2
    corners_ref = np.array([[0, half, -half], [0, -half, -half],
                            [0, -half, half], [0, half, half]], np.float32)
    r, t = kabsch(corners_ref, corners_3d)
    r = np.asarray(r)
    t = np.asarray(t) + r @ np.asarray(t_tag2ee)
    q = np.asarray(matrix_to_quat(r))
    return np.concatenate([t, q])
