#!/usr/bin/env python3
"""Feature-extractor training (reference train_feature-extractor.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_feature_extractor

if __name__ == "__main__":
    train_feature_extractor()
