"""Half-away-from-zero rounding to 6 decimal places.

Every similarity/ratio column the engine exposes next to a SQL oracle is
rounded to 6dp so floats compare exactly.  numpy's ``np.round`` and
Python's ``round`` use banker's rounding (ties to even); SQL ``round()``
(DuckDB, Postgres, ...) rounds ties AWAY from zero — a value that lands
exactly on a 6dp tie (e.g. a Jaccard of 9/128 = 0.0703125) diverges in the
last digit.  These helpers match the SQL convention.
"""

from __future__ import annotations

import math

import numpy as np

_SCALE = 1e6


def round6(x: np.ndarray) -> np.ndarray:
    """Vectorized half-away-from-zero rounding to 6dp."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * _SCALE + 0.5) / _SCALE


def round6_scalar(x: float) -> float:
    """Scalar half-away-from-zero rounding to 6dp."""
    return math.copysign(math.floor(abs(x) * _SCALE + 0.5) / _SCALE, x)
