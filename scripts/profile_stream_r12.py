#!/usr/bin/env python
"""Phase-level wall breakdown of the two streaming bench keys.

Wraps ParquetStateSink.merge and the registered fns with timers to
answer: how much of stream_srm_monitor / stream_experiment_snapshot is
(a) the streaming machinery + sink merges, (b) the downstream report
math.  Also reports snapshot file counts per merge.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mysql_postgres_debezium_cdc_spark.registry import all_queries
from mysql_postgres_debezium_cdc_spark.session import get_session
from mysql_postgres_debezium_cdc_spark.streaming import cdc as cdc_mod

MERGES: list[tuple[float, int]] = []
_orig_merge = cdc_mod.ParquetStateSink.merge


PHASES: list[str] = []


def timed_merge(self, compacted):
    from mysql_postgres_debezium_cdc_spark.streaming.cdc import apply_changes

    t0 = time.perf_counter()
    prev = self.read()
    t_read = time.perf_counter()
    new_state = apply_changes(prev, compacted, self.pk_cols, self.row_cols)
    entries = self._log_entries()
    seq = entries[-1][0] + 1 if entries else 0
    import tempfile
    import uuid

    version = f"v-{seq:08d}-{uuid.uuid4().hex[:8]}"
    out_dir = os.path.join(self.root, version)
    t_plan = time.perf_counter()
    new_state.write.mode("overwrite").parquet(out_dir)
    t_write = time.perf_counter()
    tail = (entries + [(seq, version)])[-self.retain :]
    fd, tmp = tempfile.mkstemp(dir=self.root)
    with os.fdopen(fd, "w") as f:
        f.write("\n".join(f"{s}\t{n}" for s, n in tail) + "\n")
    os.replace(tmp, self._log_path())
    keep = {name for _, name in tail}
    import shutil

    for entry in os.listdir(self.root):
        if entry.startswith("v-") and entry not in keep:
            d = os.path.join(self.root, entry)
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
    dt = time.perf_counter() - t0
    nfiles = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    MERGES.append((dt, nfiles))
    PHASES.append(
        f"read={t_read-t0:.2f} plan={t_plan-t_read:.2f} "
        f"write={t_write-t_plan:.2f} post={time.perf_counter()-t_write:.2f}"
    )


cdc_mod.ParquetStateSink.merge = timed_merge

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("profile-stream")
spark.read.parquet(f"{sf_dir}/region.parquet").count()

specs = all_queries()
for key in sys.argv[1:] or ["stream_srm_monitor", "stream_experiment_snapshot"]:
    for rep in range(3):
        MERGES.clear()
        t0 = time.perf_counter()
        df = specs[key].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.catalog.clearCache()
        merge_total = sum(d for d, _ in MERGES)
        print(
            f"{key} rep{rep}: build(fn)={t1-t0:.2f}s action={t2-t1:.2f}s "
            f"total={t2-t0:.2f}s | merges={len(MERGES)} "
            f"merge_time={merge_total:.2f}s "
            f"files_per_snapshot={[n for _, n in MERGES]}",
            flush=True,
        )
        for ph in PHASES:
            print("   ", ph, flush=True)
        PHASES.clear()
spark.stop()
