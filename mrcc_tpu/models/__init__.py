"""Model zoo: MinkUNet family + RobotNet heads (+ dense PointNet models)."""

from . import blocks, minkunet, robotnet  # noqa: F401
from .minkunet import MinkUNetBase, make_minkunet  # noqa: F401
from .robotnet import (  # noqa: F401
    RobotNet,
    RobotNetEncode,
    RobotNetSegmentation,
    RobotNetVote,
)
