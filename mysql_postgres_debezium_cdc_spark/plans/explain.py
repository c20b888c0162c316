"""Capture and audit physical plans.

``plan_report`` is the feedback loop the scale design asks for: for any
registered query it answers — did filters push into the scan?  is the
dim join a broadcast?  how many shuffles?  how wide are the codegen
spans?  Tests assert on these properties, not just result values.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_codegen_spans: int
    pushed_filters: bool
    text: str


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_str(df, "formatted")
    return PlanReport(
        n_exchanges=text.count("Exchange"),
        n_broadcast_joins=text.count("BroadcastHashJoin"),
        n_sortmerge_joins=text.count("SortMergeJoin"),
        n_codegen_spans=text.count("WholeStageCodegen"),
        pushed_filters="PushedFilters: [" in text,
        text=text,
    )
