"""CLI mains mirroring the reference's train_*.py / test*.py scripts."""

from . import common, test_mains, train_mains  # noqa: F401
