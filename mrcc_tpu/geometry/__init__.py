"""Math core: quaternions, SE(3), Kabsch, metrics, calibration averaging."""

from . import calibration, kabsch, metrics, preprocess, quaternion, transform  # noqa: F401
from .kabsch import kabsch as rigid_transform_3d  # noqa: F401
from .kabsch import kabsch_pose  # noqa: F401
from .quaternion import (  # noqa: F401
    qconj,
    qeuler,
    qmul,
    qnormalize,
    qrot,
    switch_pose_w,
    wxyz_to_xyzw,
    xyzw_to_wxyz,
)
from .transform import (  # noqa: F401
    base2cam_pose,
    matrix_to_pose,
    matrix_to_quat,
    pose_inverse,
    pose_to_matrix,
    quat_to_matrix,
    transform_pose2pose,
)
