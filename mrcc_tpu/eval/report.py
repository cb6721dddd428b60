"""Benchmark report writer — app/test.py's xlsx workbook equivalent.

Parity: /root/reference/app/test.py:331-509 — a summary table with
Avg/Min/Max/Med/Std rows for Translation, Rotation, ADD, KP error, Base2Cam
and per-class Segmentation P/R/A.  Written as .xlsx when openpyxl is
available, .csv otherwise (openpyxl is not in this image), plus a .json with
the raw numbers.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def _stats_row(values):
    v = np.asarray([x for x in values if x is not None and np.isfinite(x)],
                   np.float64)
    if len(v) == 0:
        return dict(Avg=None, Min=None, Max=None, Med=None, Std=None, N=0)
    return dict(Avg=float(v.mean()), Min=float(v.min()), Max=float(v.max()),
                Med=float(np.median(v)), Std=float(v.std()), N=int(len(v)))


def build_report_table(metrics: Dict[str, list]):
    """metrics: {metric_name: [per-instance values]} -> {name: stats}."""
    return {name: _stats_row(vals) for name, vals in metrics.items()}


def write_report(metrics: Dict[str, list], out_path: str,
                 extra: Dict = None):
    """Write the benchmark table (xlsx if possible, else csv) + raw json."""
    table = build_report_table(metrics)
    base, _ = os.path.splitext(out_path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    with open(base + ".json", "w") as f:
        json.dump({"table": table, "extra": extra or {},
                   "raw": {k: [None if v is None else float(v) for v in vals]
                           for k, vals in metrics.items()}}, f, indent=2)

    cols = ["Metric", "Avg", "Min", "Max", "Med", "Std", "N"]
    rows = [[name, *[table[name][c] for c in cols[1:]]] for name in table]
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        df = pd.DataFrame(rows, columns=cols)
        df.to_excel(base + ".xlsx", index=False)
        written = base + ".xlsx"
    except Exception:
        import csv

        with open(base + ".csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for r in rows:
                w.writerow(["" if x is None else x for x in r])
        written = base + ".csv"
    return written, table
