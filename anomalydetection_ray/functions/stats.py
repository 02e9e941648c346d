"""Shared statistical kernels (SURVEY.md §2.1 A1–A6).

These are the *semantic* operators of the reference family
(moving-average / EWMA / generalized-ESD anomaly statistics, per
BASELINE.json:6), expressed once over NumPy arrays.  BOTH the single-process
oracle (``anomalydetection_ray.oracle``) and the Ray Data batch kernels
(``anomalydetection_ray.stages``) call these functions, so the engine's
bit-for-bit gate against the oracle is achievable by construction: identical
code on identical data.

Literature pins:
- A1 moving mean/std: textbook sliding window, ``min_periods = w`` edges.
- A2 EWMA: Roberts 1959, s_0 = x_0, s_i = a*x_i + (1-a)*s_{i-1}.
- A3 generalized ESD: Rosner 1983; robust (S-H-ESD) variant replaces
  mean/std with median / 1.4826*MAD (Hochenbaum et al. 2017,
  arXiv:1704.07706 §3; no STL step — integer positions have no season).
- A4 anomaly_score: the first-iteration S-H-ESD test statistic
  max|x - median| / (1.4826 * MAD), 0.0 when MAD == 0.
- A5 gap-fill: locf (default) / linear / drop over null positions.
- A6 threshold detector: |x_i - m_i| > c * s_i on A1's moving stats.
"""

from __future__ import annotations

import numpy as np

from anomalydetection_ray.constants import MAD_SCALE
from anomalydetection_ray.functions.tppf import esd_lambda

__all__ = [
    "robust_score",
    "gap_fill",
    "moving_mean_std",
    "ewma",
    "ewma_flat",
    "segment_medians",
    "esd",
    "threshold_flags",
    "recover_int_sums",
    "weighted_mean_exact",
]

GAP_POLICIES = ("locf", "linear", "drop")


def robust_score(x: np.ndarray) -> float:
    """A4: max robust z-score of a bucket.  ``x`` must be float64."""
    if x.size == 0:
        return 0.0
    med = np.median(x)
    dev = np.abs(x - med)
    mad = np.median(dev)
    if mad == 0.0:
        return 0.0
    return float(dev.max() / (MAD_SCALE * mad))


def gap_fill(
    values: np.ndarray, valid: np.ndarray | None, policy: str = "locf"
) -> tuple[np.ndarray, np.ndarray | None]:
    """A5(a): resolve null positions inside one series.

    ``values`` int32, ``valid`` boolean mask (None means all-valid).
    Returns ``(filled_values, valid_out)`` where ``valid_out`` is None for
    locf/linear (every position defined afterwards) and the original mask for
    ``drop`` (stats must then skip invalid positions; bucket counts reflect
    only valid points and all-null buckets roll up as ``filled`` — A5(b)).
    """
    if policy not in GAP_POLICIES:
        raise ValueError(f"unknown gap policy {policy!r}")
    if valid is None or bool(valid.all()):
        return values, None
    if policy == "drop":
        return values, valid
    n = values.shape[0]
    idx = np.arange(n, dtype=np.int64)
    vidx = np.flatnonzero(valid)
    if vidx.size == 0:
        return np.zeros(n, dtype=np.int32), None
    if policy == "locf":
        # last-observation-carried-forward; leading nulls -> 0
        fill_from = np.maximum.accumulate(np.where(valid, idx, -1))
        out = np.where(fill_from >= 0, values[np.maximum(fill_from, 0)], 0)
        return out.astype(np.int32, copy=False), None
    # linear: EXACT integer interpolation between neighbour valid points,
    # round half to even; leading/trailing nulls clamp to the nearest
    # valid point (np.interp's clamp semantics).  All-integer so the SQL
    # oracle replays it bit-for-bit — num/den stay well inside int64
    # (|v| < 2^31, den < 2^20 positions).
    prev = np.maximum.accumulate(np.where(valid, idx, -1))
    nxt = np.minimum.accumulate(np.where(valid, idx, n)[::-1])[::-1]
    out = values.astype(np.int64, copy=True)
    lead = ~valid & (prev < 0)
    out[lead] = values[nxt[lead]]
    trail = ~valid & (nxt >= n)
    out[trail] = values[prev[trail]]
    mid = ~valid & ~lead & ~trail
    if mid.any():
        p, q, i = prev[mid], nxt[mid], idx[mid]
        vp = values[p].astype(np.int64)
        vq = values[q].astype(np.int64)
        den = q - p
        num = vp * (q - i) + vq * (i - p)
        quo = num // den
        r2 = (num - quo * den) * 2
        out[mid] = quo + ((r2 > den) | ((r2 == den) & (quo % 2 != 0)))
    return out.astype(np.int32), None


def moving_mean_std(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """A1: sliding mean and population std (ddof=0), window ``w``,
    ``min_periods = w`` (positions < w-1 are NaN).  ``x`` float64."""
    n = x.shape[0]
    mean = np.full(n, np.nan)
    std = np.full(n, np.nan)
    if n < w or w <= 0:
        return mean, std
    c1 = np.cumsum(x)
    c2 = np.cumsum(x * x)
    s1 = c1[w - 1:].copy()
    s1[1:] -= c1[:-w]
    s2 = c2[w - 1:].copy()
    s2[1:] -= c2[:-w]
    m = s1 / w
    v = s2 / w - m * m
    np.maximum(v, 0.0, out=v)  # guard tiny negative from cancellation
    mean[w - 1:] = m
    std[w - 1:] = np.sqrt(v)
    return mean, std


def ewma(x: np.ndarray, alpha: float) -> np.ndarray:
    """A2: Roberts-1959 exponentially weighted moving average (float64).

    Vectorized blocked prefix scan: within a block with carry ``s``,
    ``s_j = q_j * (s + cumsum(alpha * x_t / q_t))`` where
    ``q_j = (1-alpha)^(j+1)`` (cumprod).  The block length is capped so
    ``1/q`` stays < 1e250 (no overflow); the carry crosses blocks exactly.
    A per-token Python loop would be ~0.3 us/token — unusable against
    10^12-token corpora."""
    n = x.shape[0]
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    x = np.asarray(x, dtype=np.float64)
    one_m = 1.0 - alpha
    if one_m <= 0.0:  # alpha >= 1: s_i = x_i
        out[:] = x
        return out
    if one_m >= 1.0:  # alpha <= 0: constant s_0
        out[:] = x[0]
        return out
    bmax = _ewma_bmax(one_m)
    out[0] = s = float(x[0])
    i = 1
    while i < n:
        j = min(i + bmax, n)
        q = np.cumprod(np.full(j - i, one_m))
        z = np.cumsum(alpha * x[i:j] / (q / one_m))  # q_t/(1-a) = (1-a)^t
        out[i:j] = q * (s + z / one_m)
        s = float(out[j - 1])
        i = j
    return out


def _ewma_bmax(one_m: float) -> int:
    return int(min(4096, max(1, np.floor(250.0 / -np.log10(one_m)))))


def ewma_flat(x: np.ndarray, offsets: np.ndarray, alpha: float) -> np.ndarray:
    """A2 over a whole flat buffer of row-concatenated series, one
    vectorized round per ``bmax`` block ACROSS all rows — bit-identical to
    calling ``ewma(row)`` per row (same row-local block boundaries, same
    per-element IEEE ops; padded cells contribute exact 0.0 to the
    cumsums).  Rounds needed = ceil(longest_row / bmax); a batch of
    short rows completes in one round with no per-row Python."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    out = np.empty(n, dtype=np.float64)
    lens = np.diff(offsets)
    nz = lens > 0
    starts = offsets[:-1]
    if n == 0 or not nz.any():
        return out
    one_m = 1.0 - alpha
    if one_m <= 0.0:
        out[:] = x
        return out
    if one_m >= 1.0:
        # constant s_0 per row
        out[:] = np.repeat(np.where(nz, x[np.minimum(starts, n - 1)], 0.0), lens)
        return out
    bmax = _ewma_bmax(one_m)
    carry = x[starts[nz]].copy()
    out[starts[nz]] = carry
    rows = np.flatnonzero(nz)
    pos = 1
    while True:
        live = lens[rows] > pos
        rows, carry = rows[live], carry[live]
        if rows.shape[0] == 0:
            break
        seg_len = np.minimum(lens[rows] - pos, bmax)
        maxL = int(seg_len.max())
        col = np.arange(maxL, dtype=np.int64)
        mask = col[None, :] < seg_len[:, None]
        gidx = starts[rows][:, None] + pos + np.minimum(col, seg_len[:, None] - 1)
        x2d = np.where(mask, x[gidx], 0.0)
        q = np.cumprod(np.full(maxL, one_m))
        z2d = np.cumsum(alpha * x2d / (q / one_m)[None, :], axis=1)
        out2d = q[None, :] * (carry[:, None] + z2d / one_m)
        flat_idx = (starts[rows][:, None] + pos + col)[mask]
        out[flat_idx] = out2d[mask]
        carry = out2d[np.arange(rows.shape[0]), seg_len - 1].copy()
        pos += bmax
    return out


def segment_medians(v: np.ndarray, seg_of: np.ndarray, nseg: int,
                    seg_starts: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Median per contiguous segment of a flat array, vectorized: one
    global lexsort keyed (segment, value), then the two middle order
    statistics per segment — (a+b)/2 equals np.median for both parities
    ((a+a)/2 == a exactly)."""
    med = np.zeros(nseg, dtype=np.float64)
    live = seg_lens > 0
    if not live.any():
        return med
    order = np.lexsort((v, seg_of))
    sv = v[order]
    k1 = seg_starts + (seg_lens - 1) // 2
    k2 = seg_starts + seg_lens // 2
    k1 = np.minimum(k1, seg_starts + np.maximum(seg_lens - 1, 0))
    k2 = np.minimum(k2, seg_starts + np.maximum(seg_lens - 1, 0))
    med[live] = (sv[k1[live]] + sv[k2[live]]) / 2.0
    return med


def esd(
    x: np.ndarray,
    alpha: float = 0.05,
    k_max: int | None = None,
    robust: bool = True,
    direction: str = "both",
) -> tuple[int, np.ndarray]:
    """A3: generalized ESD test (Rosner 1983) / S-H-ESD robust variant.

    Returns ``(num_anomalies, indices)`` where ``indices`` are the positions
    of the detected outliers in removal order.  ``k_max`` defaults to
    ``ceil(0.02 * n)`` (the repo family's max_anoms default).  Ties on the
    max deviation break to the lowest index (np.argmax).

    ``direction`` mirrors the reference family's one-sided modes
    (Hochenbaum et al. 2017 §3): ``'pos'`` scores raw deviation above the
    center, ``'neg'`` below, each against the ONE-tailed critical value;
    ``'both'`` is the classical |x - center| two-tailed test.
    """
    if direction not in ("both", "pos", "neg"):
        raise ValueError(f"unknown direction {direction!r}")
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if k_max is None:
        k_max = int(np.ceil(0.02 * n))
    k_max = min(k_max, max(0, n - 2))
    if n < 3 or k_max < 1:
        return 0, np.empty(0, dtype=np.int64)

    remaining = np.ones(n, dtype=bool)
    removed = np.empty(k_max, dtype=np.int64)
    r_stats = np.empty(k_max, dtype=np.float64)
    k_done = 0
    for k in range(1, k_max + 1):
        xs = x[remaining]
        if robust:
            center = np.median(xs)
            scale = MAD_SCALE * np.median(np.abs(xs - center))
        else:
            center = xs.mean()
            scale = xs.std()  # ddof=0
        if scale == 0.0:
            break
        if direction == "both":
            dev = np.abs(x - center)
        elif direction == "pos":
            dev = x - center
        else:
            dev = center - x
        dev[~remaining] = -np.inf
        i_max = int(np.argmax(dev))
        r_stats[k - 1] = dev[i_max] / scale
        removed[k - 1] = i_max
        remaining[i_max] = False
        k_done = k

    two_sided = direction == "both"
    n_anom = 0
    for k in range(1, k_done + 1):
        if r_stats[k - 1] > esd_lambda(n, k, alpha, two_sided):
            n_anom = k
    return n_anom, removed[:n_anom].copy()


def threshold_flags(x: np.ndarray, w: int, c: float = 3.0) -> np.ndarray:
    """A6: control-chart detector — True where |x_i - m_i| > c * s_i
    (moving stats from A1; first w-1 positions are never flagged).

    Integer-exact windowed sums: S and Sq accumulate in int64 (token
    values are bounded, so no overflow), then m = S/w and
    var = Sq/w - m*m are single IEEE operations — the same arithmetic a
    SQL window SUM produces, so the flag booleans are reproducible
    bit-for-bit by an external oracle (float-cumsum windowed sums are
    not: their rounding drifts with position)."""
    v = np.asarray(x)
    n = v.shape[0]
    out = np.zeros(n, dtype=bool)
    if n < w or w <= 0:
        return out
    vi = v.astype(np.int64)
    # float fallback for non-integral input or magnitudes whose squared
    # cumsum could overflow int64 (|v| <= 2^20 over <= 2^23 positions is
    # safe; token vocabularies are far below both bounds)
    if not np.array_equal(vi, v) or (n and int(np.abs(vi).max()) > (1 << 20)):
        mean, std = moving_mean_std(np.asarray(x, dtype=np.float64), w)
        with np.errstate(invalid="ignore"):
            return np.abs(x - mean) > c * std
    c1 = np.concatenate(([0], np.cumsum(vi)))
    c2 = np.concatenate(([0], np.cumsum(vi * vi)))
    s1 = c1[w:] - c1[:-w]
    s2 = c2[w:] - c2[:-w]
    m = s1 / w
    var = s2 / w - m * m
    np.maximum(var, 0.0, out=var)
    std = np.sqrt(var)
    out[w - 1 :] = np.abs(v[w - 1 :].astype(np.float64) - m) > c * std
    return out


def recover_int_sums(means: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Recover each bucket's EXACT integer value-sum from (mean, count).

    A bucket mean is produced exactly once, as ``fl(s / c)`` with ``s`` an
    int64 token sum and ``|s| < 2**52``; then ``fl(fl(s/c) * c)`` is within
    ``|s| * 2**-51`` of ``s`` — far below 0.5 for any count <= 1e6 of int32
    token values — so rounding to the nearest integer restores ``s``
    exactly.  This makes the G1 merge order-free and bit-identical to a
    direct integer sum (and therefore to SQL ``sum(v)/count``), with no
    compensated-summation machinery."""
    return np.rint(np.asarray(means, dtype=np.float64)
                   * np.asarray(counts, dtype=np.float64)).astype(np.int64)


def weighted_mean_exact(means: np.ndarray, counts: np.ndarray) -> float:
    """G1 merge: count-weighted mean via exact integer-sum recovery.
    Entries with count == 0 contribute nothing.  Caller guarantees
    sum(counts) > 0.  Result == fl(sum_of_values / total_count), the same
    IEEE division the tier1 mean itself uses."""
    c = np.asarray(counts, dtype=np.int64)
    s = int(recover_int_sums(means, c).sum())
    return s / float(int(c.sum()))
