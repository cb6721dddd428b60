#!/usr/bin/env python3
"""Pose-regression evaluation (reference test.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_pose

if __name__ == "__main__":
    test_pose()
