#!/usr/bin/env python3
"""Feature-extractor evaluation (reference test_feature-extractor.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_feature_extractor

if __name__ == "__main__":
    test_feature_extractor()
