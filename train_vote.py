#!/usr/bin/env python3
"""Vote training (reference train_vote.py CLI parity: --config/--override/--exp_path)."""
from mrcc_tpu.cli.train_mains import train_vote

if __name__ == "__main__":
    train_vote()
