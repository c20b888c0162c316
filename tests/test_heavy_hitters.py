"""Misra-Gries heavy-hitters: the candidate-superset guarantee.

The two-phase plan (per-partition MG summary -> exact count of
candidates) is exact ONLY because phase 1 provably never drops a true
heavy hitter.  These tests pin that guarantee on adversarial
distributions (Zipf head, threshold-straddling items, many distinct
singletons) at the pandas level where the summary logic lives, plus the
K-row output bound that makes the shuffle constant-size.
"""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd

from mysql_postgres_debezium_cdc_spark.operators.aggregates import _MG_K, _mg_candidates


def _run_mg(tokens: list[str], batch: int = 997) -> set[str]:
    batches = (
        pd.DataFrame({"token": tokens[i : i + batch]})
        for i in range(0, len(tokens), batch)
    )
    (out,) = list(_mg_candidates(batches))
    return set(out["token"])


def _true_heavy_hitters(tokens: list[str]) -> set[str]:
    n = len(tokens)
    return {t for t, c in Counter(tokens).items() if c * _MG_K > n}


def test_mg_superset_on_zipf_with_singleton_noise():
    rng = random.Random(7)
    tokens: list[str] = []
    # Zipf-ish head: item i appears ~ 30000/(i+1) times.
    for i in range(200):
        tokens += [f"head{i}"] * (30000 // (i + 1))
    # Long singleton tail that pressures the K counters.
    tokens += [f"tail{j}" for j in range(50000)]
    rng.shuffle(tokens)
    cands = _run_mg(tokens)
    assert _true_heavy_hitters(tokens) <= cands
    assert len(cands) <= _MG_K


def test_mg_superset_when_items_straddle_threshold():
    # Items sitting just above and just below N/K — the adversarial zone.
    n_target = 100000
    per = n_target // _MG_K  # threshold count
    tokens = []
    for i in range(30):
        tokens.append(f"above{i}")
        tokens += [f"above{i}"] * per  # per+1 occurrences: just above
    while len(tokens) < n_target:
        tokens.append(f"pad{len(tokens)}")
    rng = random.Random(13)
    rng.shuffle(tokens)
    cands = _run_mg(tokens)
    hh = _true_heavy_hitters(tokens)
    assert hh, "fixture must have true heavy hitters"
    assert hh <= cands


def test_mg_randomized_property():
    rng = random.Random(42)
    for trial in range(10):
        vocab = rng.randint(10, 500)
        tokens = [
            f"t{int(rng.paretovariate(1.2)) % vocab}" for _ in range(rng.randint(1000, 20000))
        ]
        cands = _run_mg(tokens, batch=rng.choice([37, 256, 5000]))
        assert _true_heavy_hitters(tokens) <= cands, f"trial {trial}"
        assert len(cands) <= _MG_K
