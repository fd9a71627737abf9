"""Distribution summary of a sample vector (math::describe parity,
common/myutils.h:24-45) — the reference prints this for sampled
coefficient fields before each run."""

from __future__ import annotations

import numpy as np


def describe(v, name: str = "", printer=print) -> dict:
    v = np.asarray(v, dtype=np.float64)
    stats = {
        "count": int(v.size),
        "mean": float(v.mean()) if v.size else np.nan,
        "std": float(v.std(ddof=1)) if v.size > 1 else 0.0,
        "min": float(v.min()) if v.size else np.nan,
        "25%": float(np.percentile(v, 25)) if v.size else np.nan,
        "50%": float(np.percentile(v, 50)) if v.size else np.nan,
        "75%": float(np.percentile(v, 75)) if v.size else np.nan,
        "max": float(v.max()) if v.size else np.nan,
    }
    if printer is not None:
        head = f"-------- {name} --------" if name else "-" * 24
        printer(head)
        for k, val in stats.items():
            printer(f"{k:>6}: {val}")
    return stats
