"""Bounded-memory contract for the iterative trainers (VERDICT r4 #4).

The BPE trainer and the IVM loop persist per-round working state; the
r4 variants never released superseded rounds, so a K-round run pinned
K generations in the long-lived session.  These tests instrument
DataFrame.persist/unpersist and pin the HIGH-WATER MARK of live
persisted relations: the trainers must hold a bounded number of
generations no matter how many rounds run.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _method_owner(cls, name):
    """The MRO class that actually defines `name` (Spark 4 splits the
    abstract DataFrame from the classic implementation subclass)."""
    for c in cls.__mro__:
        if name in c.__dict__:
            return c
    raise AttributeError(name)


@pytest.fixture()
def persist_tracker(spark, monkeypatch):
    """Track the live set of persisted DataFrames and its high-water
    mark, via the same objects the engine calls persist/unpersist on."""
    state = {"live": set(), "high": 0}
    concrete = type(spark.range(1))
    p_owner = _method_owner(concrete, "persist")
    u_owner = _method_owner(concrete, "unpersist")
    orig_persist = p_owner.persist
    orig_unpersist = u_owner.unpersist

    def persist(self, *a, **k):
        state["live"].add(id(self))
        state["high"] = max(state["high"], len(state["live"]))
        return orig_persist(self, *a, **k)

    def unpersist(self, *a, **k):
        state["live"].discard(id(self))
        return orig_unpersist(self, *a, **k)

    monkeypatch.setattr(p_owner, "persist", persist)
    monkeypatch.setattr(u_owner, "unpersist", unpersist)
    return state


def test_bpe_trainer_holds_at_most_two_generations(spark, persist_tracker, monkeypatch):
    """A K=12 train run must hold ≤2 persisted word-state generations at
    any instant (successor materializes, THEN predecessor releases) and
    release everything when the caller doesn't need the final state."""
    from mysql_postgres_debezium_cdc_spark.llm import text

    monkeypatch.setattr(text, "BPE_TRAIN_MERGES", 12)
    merges, _final = text._bpe_train_states(spark, SF, need_final=False)
    assert merges.count() == 12  # the corpus has ≥12 learnable merges
    assert persist_tracker["high"] <= 2
    assert len(persist_tracker["live"]) == 0  # need_final=False: all released


def test_bpe_trainer_need_final_keeps_exactly_one(spark, persist_tracker):
    """need_final=True may keep ONLY the last generation cached (the
    consumer's working set) — never the superseded chain."""
    from mysql_postgres_debezium_cdc_spark.llm import text

    merges, final = text._bpe_train_states(spark, SF, need_final=True)
    assert merges.count() == text.BPE_TRAIN_MERGES
    assert persist_tracker["high"] <= 2
    assert len(persist_tracker["live"]) == 1
    final.unpersist()


def test_ivm_loop_releases_superseded_epochs(spark, persist_tracker):
    """The incremental-maintenance loop persists (agg, replica) per
    epoch; superseded epochs must release once the new pair
    materializes — ≤4 live during the handover, ≤1 after return."""
    from mysql_postgres_debezium_cdc_spark.registry import all_queries

    q = all_queries()["cdc_incremental_agg_maintenance"].fn
    out = q(spark, SF)
    assert out.count() > 0
    assert persist_tracker["high"] <= 4
    assert len(persist_tracker["live"]) <= 1
