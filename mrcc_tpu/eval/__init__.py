"""Evaluation harnesses and benchmark reports."""

from . import benchmark, harness, report  # noqa: F401
from .benchmark import BenchmarkApp  # noqa: F401
from .harness import (  # noqa: F401
    evaluate_key_points,
    evaluate_pose,
    evaluate_segmentation,
    evaluate_vote,
)
from .report import build_report_table, write_report  # noqa: F401
