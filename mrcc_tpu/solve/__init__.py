"""Pose solving: ICP refinement, clustering, keypoint->pose, vote centre."""

from . import cluster, icp, keypoints, symmetry, translation, vote  # noqa: F401
from .cluster import largest_cluster_mask  # noqa: F401
from .icp import default_template, icp_refine, icp_refine_batch  # noqa: F401
from .keypoints import (  # noqa: F401
    REFERENCE_KEY_POINTS,
    key_point_predictions,
    pose_from_key_points,
)
from .symmetry import disambiguate_flip  # noqa: F401
from .translation import predict_translation  # noqa: F401
from .vote import pred_center  # noqa: F401
