#!/usr/bin/env python3
"""Pose-regression training (reference train.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_pose

if __name__ == "__main__":
    train_pose()
