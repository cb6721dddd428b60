#!/usr/bin/env python3
"""Keypoint training (reference train_key_points.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_key_points

if __name__ == "__main__":
    train_key_points()
