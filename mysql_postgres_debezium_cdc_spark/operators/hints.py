"""Size-aware broadcast hinting — the 100 TB broadcast policy.

An explicit ``F.broadcast()`` hint OVERRIDES
``spark.sql.autoBroadcastJoinThreshold``: Spark builds and ships the
broadcast relation even if it is multi-GB at runtime, which is the
classic forced-broadcast executor-OOM when a query written at sf0.1 is
rerun at 100× the data.  Policy, applied across the TPC-H family:

- **bounded** frames — cardinality fixed independent of scale factor —
  ARE hinted.  That means the fixed-cardinality dimensions (``nation``
  = 25 rows, ``region`` = 5 rows, and frames derived only from them)
  and 1-row scalar aggregates (a global ``agg`` with no grouping keys,
  e.g. a threshold or max).  Broadcasting these is correct at ANY
  scale, and the hint matters: Catalyst's non-CBO size estimate for a
  post-aggregation or post-join frame is unreliable, so without the
  hint a provably-1-row threshold can be planned as a shuffle join.
- everything else — customer/supplier/part/orders/lineitem-derived
  frames, which grow linearly with SF — passes through UNHINTED.  At
  bench SF the 10 MB ``autoBroadcastJoinThreshold`` still plans a
  broadcast-hash join from the parquet size statistics (plan-asserted
  in tests/test_plans.py), and at 100 TB the same query degrades
  gracefully to a shuffle join with AQE skew handling instead of
  OOMing on a multi-GB broadcast build.

The reference has no analogue (its single consumer never joins,
``/root/reference/consumer/.../DebeziumToPostgresConsumer.java`` is a
row-at-a-time loop); this is pure Spark hygiene the 100 TB north star
demands.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Fixture tables whose cardinality is constant at every scale factor.
BOUNDED_DIM_TABLES = frozenset({"nation", "region"})

#: Hinted frames must never exceed this many rows at ANY scale factor.
#: (nation = 25, region = 5, scalar aggregates = 1.)
BOUNDED_MAX_ROWS = 100


def maybe_broadcast(df: DataFrame, *, bounded: bool = False) -> DataFrame:
    """Hint ``df`` for broadcast only when the caller asserts its
    cardinality is fixed independent of scale factor.

    ``bounded=True`` is a *contract*, not an optimization flag: the
    caller asserts the frame's row count has a scale-independent bound
    (a fixed-cardinality dimension or a global scalar aggregate).
    Unbounded frames return unchanged so the threshold + AQE decide —
    the plan a 1000-executor cluster would want.
    """
    return F.broadcast(df) if bounded else df
