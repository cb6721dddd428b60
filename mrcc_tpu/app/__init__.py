"""Calibration application: InferenceEngine product API, DTOs, data engines."""

from . import data_engine, dto, inference_engine  # noqa: F401
from .data_engine import PickleDataEngine, SyntheticDataEngine  # noqa: F401
from .dto import (  # noqa: F401
    CalibrationResultDTO,
    PointCloudDTO,
    RawDTO,
    ResultDTO,
    TestResultDTO,
)
from .inference_engine import InferenceConfig, InferenceEngine  # noqa: F401
