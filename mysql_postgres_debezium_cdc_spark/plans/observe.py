"""Zero-cost pipeline observability via `Dataset.observe`.

The reference's only observability is log lines per poison record
(`Consumer.java:186-188`).  Spark's `Observation` API piggybacks
aggregate metrics onto a query's EXISTING pass — the counters ride the
same whole-stage-codegen pipeline as the query itself, so data-quality
telemetry costs zero extra scans (vs the naive `df.count()` +
`df.where(bad).count()` pattern, which re-reads the input N times —
unacceptable at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observe_dq(df: DataFrame, value_col: str, name: str = "dq") -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / min / max counters for
    ``value_col`` to ``df``'s next execution.  Read ``obs.get`` after
    any action on the returned frame."""
    obs = Observation(name)
    c = F.col(value_col)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(c.isNull().cast("long")).alias("n_nulls"),
        F.min(c).alias("min_value"),
        F.max(c).alias("max_value"),
    )
    return out, obs
