"""Point ops: dense PointNet utilities + Pallas TPU kernels."""

from . import nn_pallas, points  # noqa: F401
from .nn_pallas import nn_search_pallas  # noqa: F401
from .points import (  # noqa: F401
    farthest_point_sample,
    index_points,
    query_ball_point,
    sample_and_group,
    square_distance,
    three_nn_interpolate,
)
