"""Range-fragmentation control: Hilbert vs Z2 for window queries.

A window query over a space-filling-curve-sorted layout reads the key
ranges covering the window's cells; every CONTIGUOUS run of keys is
one range scan (one parquet row-group span / object-store range
request). Fewer runs = fewer seeks at equal data read. This measures
the number of contiguous key runs needed to EXACTLY cover random
windows at a 2^order grid for both curves — the locality claim
`geom/hilbert.py` makes, measured rather than asserted.

Usage: PYTHONPATH=/root/repo python scripts/hilbert_vs_z2.py
Prints one JSON line (recorded in BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from geomesa_hive_spark.geom.hilbert import hilbert_d
from geomesa_hive_spark.geom.z2 import interleave2


def runs(keys: np.ndarray) -> int:
    """Contiguous runs in a sorted integer key set."""
    k = np.sort(keys)
    return int(1 + (np.diff(k) > 1).sum()) if k.size else 0


def main() -> int:
    order = 8
    n = 1 << order
    rng = np.random.default_rng(42)
    ratios, h_runs, z_runs = [], [], []
    for _ in range(200):
        w = int(rng.integers(4, 40))
        h = int(rng.integers(4, 40))
        x0 = int(rng.integers(0, n - w))
        y0 = int(rng.integers(0, n - h))
        xs, ys = np.meshgrid(np.arange(x0, x0 + w), np.arange(y0, y0 + h))
        hd = hilbert_d(xs.ravel(), ys.ravel(), order)
        zd = interleave2(xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64))
        rh, rz = runs(hd), runs(np.asarray(zd))
        h_runs.append(rh)
        z_runs.append(rz)
        ratios.append(rz / rh)
    out = {
        "metric": "window cover: contiguous key runs, Z2 vs Hilbert",
        "order": order,
        "windows": len(ratios),
        "mean_runs_hilbert": round(float(np.mean(h_runs)), 2),
        "mean_runs_z2": round(float(np.mean(z_runs)), 2),
        "mean_ratio_z2_over_hilbert": round(float(np.mean(ratios)), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
