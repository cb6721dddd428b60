#!/usr/bin/env python3
"""Keypoints-to-pose training (reference train_kp_to_pose.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_kp_to_pose

if __name__ == "__main__":
    train_kp_to_pose()
