"""On-chip kernel regression tier: run the Pallas oracle suites COMPILED.

The default test suite forces JAX_PLATFORMS=cpu (tests/conftest.py), which
runs every pallas_call in interpret mode — correct semantics, but blind to
Mosaic lowering regressions (round-2's commit log counts five "Mosaic
gotcha" fixes that interpret mode could never catch).  This tier re-runs
the kernel oracle files with MRCC_TEST_TPU=1 so pallas_call compiles for
the attached chip and the oracle comparisons certify the COMPILED kernels.

One command:  python scripts/test_on_tpu.py  [extra pytest args]

bench.py also runs a compact in-process version of these checks before
reporting (it refuses to print a result if the chip disagrees with the
XLA oracle) — this script is the full-suite variant.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KERNEL_SUITES = [
    "tests/test_conv_pallas.py",
    "tests/test_conv_q8.py",
    "tests/test_conv_vjp.py",
    "tests/test_conv_sk.py",
    "tests/test_conv_stream.py",
    "tests/test_rank_pallas.py",
    "tests/test_sort_pallas.py",
    "tests/test_pallas.py",
]


def main() -> int:
    env = dict(os.environ)
    env["MRCC_TEST_TPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    # --full: the kernel oracle files are slow-tier modules (skipped by the
    # fast default); this tier exists precisely to run them, compiled
    cmd = [sys.executable, "-m", "pytest", "-x", "-q", "--full",
           *KERNEL_SUITES, *sys.argv[1:]]
    print("on-TPU kernel tier:", " ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd, cwd=REPO, env=env)


if __name__ == "__main__":
    sys.exit(main())
