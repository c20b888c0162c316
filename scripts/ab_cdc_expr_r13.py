#!/usr/bin/env python
"""r13: the CDC decode/compact/apply trees as SQL-string expressions —
the same py4j-chatter cut as the report/banded/media rewrites.
`cdc_offset_range_diff` built in 0.89 s (1 759 round trips, 0.67 s
socket wait) and `cdc_lastwrite_materialize` in 0.52 s (1 400 trips);
the trees also rebuild PER MICRO-BATCH inside the streaming state-sink
merges.  The parametric pieces (row schema, pk/row column lists) ride
as DDL `simpleString` / interpolated identifiers.

`check`: the pre-r13 DSL formulations (inline below, verbatim) vs the
repo implementations — analyzed plans identical modulo expression ids
AND identical rows at all three scales, for both bench keys
end-to-end.  `ab`: interleaved best-of-6 at sf0.1."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from mysql_postgres_debezium_cdc_spark.sources.debezium import (  # noqa: E402
    envelope_schema,
)
from mysql_postgres_debezium_cdc_spark.sources.parquet import (  # noqa: E402
    load,
    spread_small_scan,
)
from mysql_postgres_debezium_cdc_spark.session import get_session  # noqa: E402
from mysql_postgres_debezium_cdc_spark.streaming.cdc import (  # noqa: E402
    IS_DELETE,
    ORDER_COL,
)
from mysql_postgres_debezium_cdc_spark.streaming.cdc_queries import (  # noqa: E402
    EVENTS_ROW_SCHEMA,
)


def decode_envelope_dsl_r12(df, row_schema, value_col="value", topic_col="topic"):
    """Pre-r13 DSL body of decode_envelope, verbatim."""
    schema = envelope_schema(row_schema)
    wrapped_schema = T.StructType([T.StructField("payload", schema)])
    looks_wrapped = F.col(value_col).contains('"payload"')
    parse_wrapped = F.from_json(F.col(value_col), wrapped_schema).getField("payload")
    parse_bare = F.from_json(F.col(value_col), schema)
    env = F.coalesce(
        F.when(looks_wrapped, parse_wrapped).otherwise(parse_bare),
        F.when(looks_wrapped, parse_bare).otherwise(parse_wrapped),
    )
    topic_table = (
        F.element_at(F.split(F.col(topic_col), r"\."), -1)
        if topic_col and topic_col in df.columns
        else F.lit(None).cast("string")
    )
    out = df.withColumn("_env", env).select(
        "*",
        F.col("_env.op").alias("op"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.col("_env.source.db").alias("src_db"),
        F.coalesce(F.col("_env.source.table"), topic_table).alias("src_table"),
        F.col("_env.ts_ms").alias("ts_ms"),
    )
    is_tombstone = F.col(value_col).isNull() | (F.trim(F.col(value_col)) == "")
    return (
        out.withColumn("_tombstone", is_tombstone)
        .withColumn(
            "_error",
            F.when(
                ~is_tombstone & F.col("op").isNull(),
                F.concat(
                    F.lit("unparseable envelope: "), F.substring(value_col, 1, 120)
                ),
            ).when(
                ~is_tombstone & ~F.col("op").isin("c", "r", "u", "d"),
                F.concat(F.lit("unsupported op: "), F.col("op")),
            ),
        )
        .drop("_env")
    )


def with_change_columns_dsl_r12(decoded, offset_col="offset"):
    return (
        decoded.where(F.col("_error").isNull() & ~F.col("_tombstone"))
        .where(F.col("op").isin("c", "r", "u", "d"))
        .withColumn(IS_DELETE, F.col("op") == "d")
        .withColumn(ORDER_COL, F.col(offset_col).cast("long"))
    )


def compact_dsl_r12(batch, pk_cols):
    keyed = batch.select(
        "*",
        *[
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(f"_pk_{c}")
            for c in pk_cols
        ],
    )
    pk_aliases = [f"_pk_{c}" for c in pk_cols]
    others = [c for c in keyed.columns if c not in pk_aliases]
    return (
        keyed.groupBy(*pk_aliases)
        .agg(F.max_by(F.struct(*others), F.col(ORDER_COL)).alias("_latest"))
        .select(*pk_aliases, "_latest.*")
    )


def apply_changes_dsl_r12(state, compacted, pk_cols, row_cols):
    upserts = compacted.where(~F.col(IS_DELETE)).select(
        *[F.col(f"_pk_{c}").alias(c) for c in pk_cols],
        *[F.col(f"after.{c}").alias(c) for c in row_cols],
        F.col(ORDER_COL),
    )
    if state is None:
        return upserts
    touched = compacted.select(*[F.col(f"_pk_{c}").alias(c) for c in pk_cols])
    untouched = state.join(touched, on=list(pk_cols), how="left_anti")
    return untouched.unionByName(upserts)


def events_changelog_dsl_r12(spark, sf_dir, lo=None, hi=None):
    ev = load(spark, sf_dir, "events")
    if lo is not None:
        ev = ev.where(F.col("event_id") >= lo)
    if hi is not None:
        ev = ev.where(F.col("event_id") < hi)
    ev = spread_small_scan(ev)
    op = F.when(F.col("event_type") == "error", "d").otherwise("u")
    row_image = F.struct(F.col("user_id").alias("id"), F.col("value").alias("v"))
    env = F.struct(
        F.when(op == "d", row_image).alias("before"),
        F.when(op != "d", row_image).alias("after"),
        F.struct(
            F.lit("app").alias("db"),
            F.lit("user_state").alias("table"),
            F.unix_millis("ts").alias("ts_ms"),
        ).alias("source"),
        op.alias("op"),
        F.unix_millis("ts").alias("ts_ms"),
    )
    return ev.select(F.to_json(env).alias("value"), F.col("event_id").alias("offset"))


def lastwrite_dsl_r12(spark, sf_dir):
    raw = events_changelog_dsl_r12(spark, sf_dir)
    events = with_change_columns_dsl_r12(decode_envelope_dsl_r12(raw, EVENTS_ROW_SCHEMA))
    state = apply_changes_dsl_r12(None, compact_dsl_r12(events, ["id"]), ["id"], ["v"])
    return state.select(
        "id", F.round("v", 2).alias("v"), F.col(ORDER_COL).alias("last_offset")
    ).orderBy("id")


def offset_diff_dsl_r12(spark, sf_dir):
    mid_df = (
        load(spark, sf_dir, "events")
        .agg(F.max("event_id").alias("_mx"))
        .select(F.coalesce(F.expr("_mx DIV 2"), F.lit(0)).cast("long").alias("_mid"))
    )
    raw = events_changelog_dsl_r12(spark, sf_dir)
    events = with_change_columns_dsl_r12(decode_envelope_dsl_r12(raw, EVENTS_ROW_SCHEMA))
    keyed = (
        events.select(
            F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"),
            F.col("op").alias("op"),
            F.col(ORDER_COL).alias("off"),
        )
        .where(F.col("id").isNotNull())
        .crossJoin(F.broadcast(mid_df))
    )
    before_off = F.when(F.col("off") < F.col("_mid"), F.col("off"))
    g = keyed.groupBy("id").agg(
        F.max_by("op", before_off).alias("op_t"),
        F.max(before_off).alias("off_t"),
        F.max_by("op", F.col("off")).alias("op_e"),
        F.max("off").alias("off_e"),
    )
    present_t = F.col("op_t").isNotNull() & (F.col("op_t") != "d")
    present_e = F.col("op_e") != "d"
    return (
        g.where(
            (present_t != present_e)
            | (present_t & present_e & (F.col("off_t") != F.col("off_e")))
        )
        .select(
            "id",
            F.when(~present_t, "insert")
            .when(~present_e, "delete")
            .otherwise("update")
            .alias("change"),
            F.when(present_t, F.col("off_t")).alias("offset_before"),
            F.when(present_e, F.col("off_e")).alias("offset_after"),
        )
        .orderBy("id")
    )


def norm_plan(df):
    return re.sub(r"#\d+", "#N", df._jdf.queryExecution().analyzed().toString())


def main():
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    spark = get_session("ab-cdc-expr-r13")
    specs = all_queries()
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    rc = 0
    pairs = (
        ("cdc_lastwrite_materialize", lastwrite_dsl_r12),
        ("cdc_offset_range_diff", offset_diff_dsl_r12),
    )
    if mode == "check":
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sfd = f"/root/testdata/{sf}"
            for key, old_fn in pairs:
                old = old_fn(spark, sfd)
                new = specs[key].fn(spark, sfd)
                plan_same = norm_plan(old) == norm_plan(new)
                rows_same = old.collect() == new.collect()
                ok = plan_same and rows_same
                rc |= 0 if ok else 1
                print(
                    f"{sf} {key}: plan_identical={plan_same} rows={rows_same}",
                    flush=True,
                )
                if not plan_same:
                    import difflib

                    for ln in list(
                        difflib.unified_diff(
                            norm_plan(old).splitlines(),
                            norm_plan(new).splitlines(),
                            lineterm="",
                        )
                    )[:24]:
                        print("   ", ln)
                spark.catalog.clearCache()
    else:
        sfd = "/root/testdata/sf0.1"
        spark.read.parquet(f"{sfd}/region.parquet").count()
        for rnd in range(6):
            for key, old_fn in pairs:
                for name, fn in (("old", old_fn), ("new", specs[key].fn)):
                    t0 = time.perf_counter()
                    df = fn(spark, sfd)
                    t1 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    t2 = time.perf_counter()
                    spark.catalog.clearCache()
                    print(
                        f"round{rnd} {key} {name}: build={t1 - t0:.3f} "
                        f"action={t2 - t1:.3f} total={t2 - t0:.3f}",
                        flush=True,
                    )
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
