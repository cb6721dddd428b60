#!/usr/bin/env python3
"""Segmentation evaluation (reference test_segmentation.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_segmentation

if __name__ == "__main__":
    test_segmentation()
