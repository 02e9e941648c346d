"""anomalydetection_ray — a Ray-Data-native time-series rollup + downsample +
retention engine.

Capability-equivalent to the semantics of the ``qweshpd/AnomalyDetection``
reference family (moving-average / ESD-style per-series statistics), built
from scratch on ``ray.data.Dataset``.  The authoritative functional spec is
``BASELINE.json`` (north_star line 6, north_rule line 14, input_hint line 15);
the reference checkout at /root/reference was empty at build time (SURVEY.md
§0), so all per-operator semantics are pinned to the primary literature:
Rosner 1983 (generalized ESD), Hochenbaum/Vallis/Kejariwal 2017
(arXiv:1704.07706, S-H-ESD robust variant), Roberts 1959 (EWMA),
Pelkonen et al. VLDB'15 (Gorilla XOR + delta-of-delta codecs).

Layout
------
- ``constants``      : bucket widths, partition split size, engine version
- ``functions.tppf`` : Student-t PPF from scratch (no scipy on this box)
- ``functions.stats``: the shared scalar/vector kernels (gap-fill, bucket
  stats, robust score, ESD, EWMA, moving stats, Kahan tier2 merge). BOTH the
  single-process oracle and the Ray kernels import these, which is what makes
  the bit-for-bit gate meaningful.
- ``codecs``         : Gorilla XOR (int32) + delta-of-delta encode/decode
- ``oracle``         : the single-process reference implementation the
  north star gates against (BASELINE.json:6)
- ``sources``        : parquet reader, deterministic synthetic generator,
  validator/row-splitter
- ``stages``         : Ray Data batch kernels (rollup M1, encode E1/E2,
  decode E3, detector registry X1)
- ``pipelines``      : end-to-end pipelines P1 (rollup), P2 (ingest/encode),
  P3 (verify) + the driver-table query library
- ``state``          : per-partition manifest / checkpoint (resume)
"""

from anomalydetection_ray.constants import (  # noqa: F401
    ENGINE_VERSION,
    MAX_TOKENS_PER_PART,
    TIER1_BUCKET,
    TIER2_BUCKET,
)
