"""Focused gates for the round-13 optimization internals.

t05's JVM winnow projection (round 13, VERDICT r12 #1) claims bit-parity
with the per-doc Python reference kernel it replaced: ``slice`` truncates
like ``hs[i:i+4]``, ``array_min`` over md5 hex strings is the same
lexicographic min, ``array_distinct``/``size`` matches ``set``/``len``.
This pins that claim row-by-row against an independent hashlib reference
(the r12 kernel's exact logic) over real data plus the edge shapes
(null text, <3 tokens, exactly 3 tokens, duplicate-heavy docs).
"""

from __future__ import annotations

import hashlib

SF_DIR = "/root/testdata/sf0.001"


def _reference_counts(rows):
    out = {}
    for doc_id, text in rows:
        ts = text.split(" ") if text is not None else []
        if len(ts) < 3:
            continue
        hs = [
            hashlib.md5(" ".join(ts[i : i + 3]).encode()).hexdigest()
            for i in range(len(ts) - 2)
        ]
        out[doc_id] = len({min(hs[i : i + 4]) for i in range(len(hs))})
    return out


def test_t05_jvm_winnow_matches_reference(spark):
    from hive_udf_neologd_spark.operators.textops import _t05_fingerprints
    from hive_udf_neologd_spark.sources import read_table

    got = {
        r["doc_id"]: r["n_fingerprints"]
        for r in _t05_fingerprints(spark, SF_DIR).collect()
    }
    rows = [
        (r["doc_id"], r["text"])
        for r in read_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    assert got == _reference_counts(rows)


def test_t05_jvm_winnow_edge_shapes(spark, tmp_path):
    from pyspark.sql import functions as F

    from hive_udf_neologd_spark.operators.textops import _t05_fingerprints

    rows = [
        (1, None),                      # null text -> skipped
        (2, ""),                        # empty -> 1 token -> skipped
        (3, "a b"),                     # 2 tokens -> skipped
        (4, "a b c"),                   # exactly 3 tokens -> 1 shingle
        (5, "a b c d e f"),             # 4 shingles, one full window
        (6, "x x x x x x x x"),         # duplicate shingles collapse
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    got = {
        r["doc_id"]: r["n_fingerprints"]
        for r in _t05_fingerprints(spark, path).collect()
    }
    assert got == _reference_counts(rows)
