#!/usr/bin/env python3
"""Vote evaluation (reference test_vote.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.test_mains import test_vote

if __name__ == "__main__":
    test_vote()
