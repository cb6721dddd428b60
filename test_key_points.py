#!/usr/bin/env python3
"""Keypoint evaluation (reference test_key_points.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_key_points

if __name__ == "__main__":
    test_key_points()
