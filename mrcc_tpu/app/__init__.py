"""Calibration application: InferenceEngine product API, DTOs, data engines,
app drivers (headless main loop, directory calibration, ArUco baseline)."""

from . import (  # noqa: F401
    aruco_calibration,
    calibrate_pcd,
    data_engine,
    dto,
    inference_engine,
    main,
)
from .calibrate_pcd import DirectoryDataEngine, calibrate_directory  # noqa: F401
from .data_engine import PickleDataEngine, SyntheticDataEngine  # noqa: F401
from .main import MainApp  # noqa: F401
from .dto import (  # noqa: F401
    CalibrationResultDTO,
    PointCloudDTO,
    RawDTO,
    ResultDTO,
    TestResultDTO,
)
from .inference_engine import InferenceConfig, InferenceEngine  # noqa: F401
