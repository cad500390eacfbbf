"""Parity harness: relative-L2 comparators and golden-file regression.

SURVEY.md §4 derives the test pyramid this framework needs; this module
provides level (c)/(d): golden snapshots of short transients (the
reference's de-facto integration test is its ``--dry_run`` smoke mode,
1D/MPNP_CO2ER_EDL.py:256-268) and field comparators for parity studies.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    """Relative L2 difference ||a-b|| / ||b|| (the BASELINE.json parity
    metric)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = np.linalg.norm(b.reshape(-1))
    if denom == 0:
        return float(np.linalg.norm(a.reshape(-1)))
    return float(np.linalg.norm((a - b).reshape(-1)) / denom)


def field_summary(u: np.ndarray, names) -> Dict[str, Dict[str, float]]:
    """Compact per-field fingerprint of a (N, f) state: robust scalars that
    pin down the solution without storing the full field."""
    u = np.asarray(u)
    out = {}
    for i, nm in enumerate(names):
        col = u[:, i]
        out[nm] = {
            "min": float(col.min()),
            "max": float(col.max()),
            "mean": float(col.mean()),
            "l2": float(np.linalg.norm(col)),
            "first": float(col[0]),
            "last": float(col[-1]),
        }
    return out


class GoldenFile:
    """Self-generated golden snapshots with explicit regeneration.

    First run (or GMPNP_REGEN_GOLDENS=1) writes the snapshot; later runs
    compare every recorded scalar at the given relative tolerance.
    """

    def __init__(self, path: str, rtol: float = 1e-8, atol: float = 1e-10):
        self.path = path
        self.rtol = rtol
        self.atol = atol

    def check(self, data: Dict) -> Optional[str]:
        """Returns None on match (or after regeneration), else a message
        describing the first mismatch."""
        regen = os.environ.get("GMPNP_REGEN_GOLDENS") == "1"
        if regen or not os.path.exists(self.path):
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "w") as f:
                json.dump(data, f, indent=1, sort_keys=True)
            return None
        with open(self.path) as f:
            ref = json.load(f)
        return self._compare("", data, ref)

    def _compare(self, prefix, got, ref):
        if isinstance(ref, dict):
            if not isinstance(got, dict):
                return f"{prefix}: type changed"
            for k in ref:
                if k not in got:
                    return f"{prefix}.{k}: missing"
                msg = self._compare(f"{prefix}.{k}", got[k], ref[k])
                if msg:
                    return msg
            return None
        if isinstance(ref, float):
            g = float(got)
            if not np.isfinite(g) and not np.isfinite(ref):
                return None
            if abs(g - ref) > self.atol + self.rtol * abs(ref):
                return (f"{prefix}: {g!r} != golden {ref!r} "
                        f"(rtol {self.rtol})")
            return None
        if got != ref:
            return f"{prefix}: {got!r} != golden {ref!r}"
        return None
