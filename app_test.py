#!/usr/bin/env python3
"""Full-pipeline benchmark (app/test.py parity) (reference app_test.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_app

if __name__ == "__main__":
    test_app()
