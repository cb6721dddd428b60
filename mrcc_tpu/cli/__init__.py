"""CLI mains mirroring the reference's train_*.py / test*.py scripts."""

import mrcc_tpu

# entry-point layer: every train_*/test_* CLI benefits from the persistent
# compile cache (cold fused-program compiles take minutes on the tunneled
# runtime); the library itself no longer enables it at import
mrcc_tpu.enable_compilation_cache()

from . import common, test_mains, train_mains  # noqa: F401,E402
