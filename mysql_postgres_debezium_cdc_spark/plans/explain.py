"""Capture and audit physical plans.

``plan_report`` is the feedback loop the scale design asks for: for any
registered query it answers — did filters push into the scan?  is the
dim join a broadcast?  how many shuffles?  how wide are the codegen
spans?  Tests assert on these properties, not just result values.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    n_exchanges: int
    n_shuffles: int  # hash/range repartitions only (broadcast exchanges excluded)
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_codegen_spans: int
    pushed_filters: bool
    ops: list[str]
    text: str


_OP_RE = re.compile(r"^\(\d+\) ([A-Za-z]+)", re.MULTILINE)


def plan_report(df: DataFrame) -> PlanReport:
    """Parse ``explain('formatted')`` into countable plan facts.

    Formatted mode prints every operator twice (tree + numbered
    details); only the numbered detail headers are counted, so each
    physical operator counts once."""
    text = explain_str(df, "formatted")
    ops = _OP_RE.findall(text)
    return PlanReport(
        n_exchanges=sum(o == "Exchange" for o in ops),
        n_shuffles=text.count("Arguments: hashpartitioning")
        + text.count("Arguments: rangepartitioning"),
        n_broadcast_joins=sum(o == "BroadcastHashJoin" for o in ops),
        n_sortmerge_joins=sum(o == "SortMergeJoin" for o in ops),
        n_codegen_spans=len(set(re.findall(r"codegen id : (\d+)", text))),
        pushed_filters="PushedFilters: [" in text,
        ops=ops,
        text=text,
    )
