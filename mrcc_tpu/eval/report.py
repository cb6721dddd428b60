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
                 extra: Dict = None, position_metrics: Dict = None):
    """Write the benchmark workbook (xlsx if possible, else csv) + raw json.

    ``position_metrics``: optional {position: {metric: [values]}} —
    rendered as one block/sheet per position after the OVERALL block,
    mirroring the reference workbook layout (app/test.py:444-509:
    OVERALL + per-position sections, per-class segmentation columns come
    in through the metric names).
    """
    table = build_report_table(metrics)
    pos_tables = {p: build_report_table(m)
                  for p, m in (position_metrics or {}).items()}
    base, _ = os.path.splitext(out_path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    with open(base + ".json", "w") as f:
        json.dump({"table": table, "extra": extra or {},
                   "positions": pos_tables,
                   "raw": {k: [None if v is None else float(v) for v in vals]
                           for k, vals in metrics.items()}}, f, indent=2)

    cols = ["Metric", "Avg", "Min", "Max", "Med", "Std", "N"]

    def rows_of(tbl):
        return [[name, *[tbl[name][c] for c in cols[1:]]] for name in tbl]

    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(base + ".xlsx") as xw:
            pd.DataFrame(rows_of(table), columns=cols).to_excel(
                xw, sheet_name="OVERALL", index=False)
            for p, tbl in pos_tables.items():
                pd.DataFrame(rows_of(tbl), columns=cols).to_excel(
                    xw, sheet_name=str(p)[:31], index=False)
        written = base + ".xlsx"
    except Exception:
        import csv

        with open(base + ".csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["SECTION", *cols])
            for r in rows_of(table):
                w.writerow(["OVERALL"] + ["" if x is None else x for x in r])
            for p, tbl in pos_tables.items():
                for r in rows_of(tbl):
                    w.writerow([p] + ["" if x is None else x for x in r])
        written = base + ".csv"
    return written, table
