"""One-off profiling of dedup_simhash stages at sf0.1 (not part of the suite)."""
import time

import pyspark.sql.functions as F

from mysql_postgres_debezium_cdc_spark.session import get_session
from mysql_postgres_debezium_cdc_spark.llm import dedup as D

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s -> {out}")
    return out


def main():
    spark = get_session("profile")
    spark.read.parquet(f"{SF}/region.parquet").count()

    toks = D._shingles(spark, SF).persist()
    t("shingles count", toks.count)
    ids = D._global_rank(toks, "shingle", "tid")
    t("global_rank count", ids.count)
    dt = toks.join(ids, "shingle").select("doc_id", "tid")
    t("dt count", dt.count)

    import functools
    bit_terms = [
        F.when(
            F.sum(
                F.when(((j * D.MH_MULT + 1) * F.col("tid") + j) % D.MH_PRIME % 2 == 1, 1).otherwise(-1)
            ) >= 0,
            F.lit(1 << j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(D.SH_BITS)
    ]
    sigs = dt.groupBy("doc_id").agg(
        functools.reduce(lambda a, b: a + b, bit_terms).alias("sig")
    ).persist()
    t("sigs count", sigs.count)

    band_vals = F.array(
        *[(F.col("sig") / F.lit(c)).cast("bigint") % (1 << D.SH_BAND_BITS) for c in D._SH_BAND_CONSTS]
    )
    buckets = (
        sigs.select("doc_id", F.posexplode(band_vals).alias("band", "bval"))
        .groupBy("band", "bval")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") > 1)
    ).persist()
    t("buckets count", buckets.count)
    t("max bucket width", lambda: buckets.agg(F.max(F.size("docs"))).collect()[0][0])
    t("total pairs", lambda: buckets.agg(
        F.sum(F.size("docs") * (F.size("docs") - 1) / 2)).collect()[0][0])

    cand = D._pairs_from_bucket(buckets).persist()
    t("cand pairs (pre-distinct)", cand.count)
    candd = cand.distinct().persist()
    t("cand pairs (distinct)", candd.count)

    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("bigint")
    out = (
        candd.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= D.SH_HAMMING_MAX)
    )
    t("verified count", out.count)

    t0 = time.perf_counter()
    D.dedup_simhash(spark, SF).write.format("noop").mode("overwrite").save()
    print(f"full query end-to-end: {time.perf_counter() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
