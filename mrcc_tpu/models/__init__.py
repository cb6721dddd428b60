"""Model zoo: MinkUNet family + RobotNet heads (+ dense PointNet models)."""

from . import blocks, minkunet, robotnet  # noqa: F401
from .minkunet import MinkUNetBase, make_minkunet  # noqa: F401
from .robotnet import (  # noqa: F401
    RobotNet,
    RobotNetEncode,
    RobotNetSegmentation,
    RobotNetVote,
)
from .aliveunet import AliveUNet  # noqa: F401
from .featurenet import FeatureNet  # noqa: F401
from .pointnet2 import PointNet, PointNet2MSGEncoder, PointNet2SSG  # noqa: F401
from .resnet_sparse import (  # noqa: F401
    SparseResFieldNet,
    SparseResNet14,
    SparseResNet18,
    SparseResNet34,
    SparseResNet50,
    SparseResNet101,
)
