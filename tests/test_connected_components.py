"""Property test: distributed min-label CC ≡ union-find on any graph.

The pointer-jumping loop is the one iterative distributed algorithm in
the engine — exactly where subtle bugs (stale labels, missed
propagation, premature convergence) live, and the fixture corpus only
ever exercises tiny star-shaped components.  Random graphs with long
chains and cross-links pin it against a Python union-find oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_postgres_debezium_cdc_spark.llm.dedup import connected_components


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # roots are the component minima (we always attach the larger root)
    return {n: find(n) for n in parent}


pairs_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
    min_size=1,
    max_size=40,
).map(lambda ps: [(a, b) for a, b in ps if a != b])


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=pairs_strategy)
def test_cc_equals_union_find(spark, pairs):
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component_id"] for r in connected_components(df).collect()
    }
    assert got == _union_find(pairs)


def test_cc_long_chain_converges(spark):
    """A 200-node path graph: diameter 199 — pointer jumping must
    converge far inside the 32-round cap and label every node 0."""
    pairs = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["component_id"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0} and len(got) == 200
