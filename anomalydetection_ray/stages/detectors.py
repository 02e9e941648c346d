"""X1 — pluggable per-series detector registry (SURVEY.md §2.2 X1).

Mirrors the reference family's pluggable-algorithm surface: a detector is
``fn(values: np.ndarray, **params) -> dict of np arrays`` producing
per-position or per-series outputs.  Registered detectors run inside a
stateless ``map_batches`` kernel over validated sequences rows.

Built-ins: A2 EWMA smoother, A3 generalized-ESD anomaly count (robust
S-H-ESD default), A6 moving-window threshold flags.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

from anomalydetection_ray.functions.stats import esd, ewma, threshold_flags

_REGISTRY: dict[str, Callable] = {}


def register_detector(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def get_detector(name: str) -> Callable:
    return _REGISTRY[name]


def detectors() -> list[str]:
    return sorted(_REGISTRY)


def _det_esd(values: np.ndarray, alpha: float = 0.05, k_max: int | None = None,
             robust: bool = True) -> dict:
    n_anom, idx = esd(values.astype(np.float64), alpha=alpha, k_max=k_max, robust=robust)
    return {"n_anomalies": int(n_anom), "anomaly_positions": np.sort(idx).tolist()}


def _det_threshold(values: np.ndarray, window: int = 50, c: float = 3.0) -> dict:
    flags = threshold_flags(values.astype(np.float64), window, c)
    pos = np.flatnonzero(flags)
    return {"n_anomalies": int(pos.size), "anomaly_positions": pos.tolist()}


def _det_ewma_resid(values: np.ndarray, alpha: float = 0.1, c: float = 4.0) -> dict:
    """EWMA control chart (Roberts 1959): flag |x_i - s_{i-1}| > c * robust
    sigma of the one-step residuals."""
    x = values.astype(np.float64)
    if x.shape[0] < 3:
        return {"n_anomalies": 0, "anomaly_positions": []}
    s = ewma(x, alpha)
    resid = x[1:] - s[:-1]
    med = np.median(resid)
    mad = np.median(np.abs(resid - med))
    if mad == 0.0:
        return {"n_anomalies": 0, "anomaly_positions": []}
    sigma = 1.4826 * mad
    pos = (np.flatnonzero(np.abs(resid - med) > c * sigma) + 1)
    return {"n_anomalies": int(pos.size), "anomaly_positions": pos.tolist()}


register_detector("esd", _det_esd)
register_detector("threshold", _det_threshold)
register_detector("ewma", _det_ewma_resid)


def detect_batch(batch: pa.Table, detector: str = "esd", **params) -> pa.Table:
    """Validated sequences rows -> per-series detector report."""
    fn = get_detector(detector)
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n_list, pos_list = [], []
    for i in range(batch.num_rows):
        arr = tokens[i].values
        vals = np.asarray(arr.fill_null(0) if arr.null_count else arr, dtype=np.int32) \
            if len(arr) else np.empty(0, dtype=np.int32)
        out = fn(vals, **params)
        n_list.append(out["n_anomalies"])
        pos_list.append(out["anomaly_positions"])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "part_id": batch.column("part_id"),
            "detector": pa.array([detector] * batch.num_rows, type=pa.string()),
            "n_anomalies": pa.array(n_list, type=pa.int64()),
            "anomaly_positions": pa.array(pos_list, type=pa.list_(pa.int64())),
        }
    )
