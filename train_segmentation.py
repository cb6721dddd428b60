#!/usr/bin/env python3
"""Segmentation training (reference train_segmentation.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_segmentation

if __name__ == "__main__":
    train_segmentation()
