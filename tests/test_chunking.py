"""Chunk-boundary contract for corpus_chunk_documents.

The boundary math (ceil-of-stride chunk count, short final chunk, every
token covered) is the likeliest bug site; this pins it against a pure
python oracle on adversarial lengths: shorter than one chunk, exactly
one chunk, one token past a chunk, exact stride multiples, and a
randomized sweep — with non-default widths/strides so the contract
holds for the helper generally, not just the registered constants.
"""

from __future__ import annotations

import hashlib
import random

from mysql_postgres_debezium_cdc_spark.llm.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
)


def _python_chunks(tokens: list[str], width: int, stride: int):
    n = len(tokens)
    n_chunks = max(0, -(-(max(n - width, 0)) // stride)) + 1
    out = []
    for k in range(n_chunks):
        start = k * stride  # 0-based
        piece = tokens[start : start + width]
        out.append(
            (
                k,
                start + 1,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
        )
    return out


def _spark_chunks(spark, texts, width, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, width=width, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, r.n_chunk_tokens, r.chunk_md5)
        )
    return {d: sorted(v) for d, v in by_doc.items()}


def test_chunk_boundaries_adversarial_lengths(spark):
    width, stride = 8, 5
    # n in: < width, == width, width+1, width+stride (exact multiple),
    # width+stride+1, and a long doc.
    lengths = [1, 3, 7, 8, 9, 13, 14, 40]
    texts = [" ".join(f"t{i}w{j}" for j in range(n)) for i, n in enumerate(lengths)]
    got = _spark_chunks(spark, texts, width, stride)
    for i, n in enumerate(lengths):
        toks = texts[i].split(" ")
        assert got[i] == _python_chunks(toks, width, stride), f"n={n}"
        # every token covered: last chunk must reach position n
        last = got[i][-1]
        assert last[1] + last[2] - 1 == n


def test_chunk_boundaries_randomized_default_constants(spark):
    rng = random.Random(99)
    lengths = [rng.randint(1, 400) for _ in range(25)]
    texts = [" ".join(f"d{i}x{j}" for j in range(n)) for i, n in enumerate(lengths)]
    got = _spark_chunks(spark, texts, CHUNK_TOKENS, CHUNK_STRIDE)
    for i, n in enumerate(lengths):
        toks = texts[i].split(" ")
        assert got[i] == _python_chunks(toks, CHUNK_TOKENS, CHUNK_STRIDE), f"n={n}"
