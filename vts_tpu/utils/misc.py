"""Misc utilities (reference myutils.py:14-144): dated log dirs, CLAHE
equalization re-export, and a gated spreadsheet-upload hook (the reference
uploads metric tables to Google Sheets; gspread is not a dependency here —
the hook degrades to CSV)."""

from __future__ import annotations

import csv
import datetime
import os
from typing import Dict, List, Optional

from ..postprocess import equalize_adaptive as equalize_this  # noqa: F401


def create_log_dir_by_date(base: str = "logs") -> str:
    d = os.path.join(base, datetime.date.today().isoformat())
    os.makedirs(d, exist_ok=True)
    return d


def upload_metrics_table(rows: List[Dict[str, float]], sheet_name: str,
                         out_dir: str = "logs", credentials: Optional[str] = None) -> str:
    """Reference myutils.py:32-84 uploads to Google Sheets; without gspread
    (or credentials) the table lands in a CSV with the same content."""
    if credentials:
        try:
            import gspread  # noqa: F401
        except ImportError:
            print("[misc] gspread not installed — writing CSV instead")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{sheet_name}.csv")
    if rows:
        keys = sorted({k for r in rows for k in r})
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(rows)
    return path
