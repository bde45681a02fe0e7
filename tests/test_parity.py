"""External segmentation-parity corpus (tokenizer/parity.py, VERDICT r6
next-round #1): corpus integrity, recorded-aggregate consistency, and the
gated micro-F1 floor."""

from __future__ import annotations

import pytest

from hive_udf_neologd_spark.tokenizer.parity import (
    PARITY_CORPUS,
    T22_EXPECTED,
    T22_F1_FLOOR,
    compute_expected,
    expected_spans,
    micro_f1,
    predicted_spans,
)

# Characters allowed BETWEEN expected tokens (discarded by the tokenizer):
# Japanese/ASCII punctuation and whitespace only.
_PUNCT = set("。、．，・「」『』（）()！？!?　 　…―ー-：:；;")


class TestCorpusIntegrity:
    def test_unique_sids(self):
        sids = [sid for sid, *_ in PARITY_CORPUS]
        assert len(sids) == len(set(sids))

    def test_spans_reconstruct_with_punct_only_gaps(self):
        """Every expected token occurs in order; skipped characters must be
        punctuation/whitespace — a typo in an expected segmentation fails
        HERE, not silently in the F1."""
        for sid, _register, text, surfaces in PARITY_CORPUS:
            spans = expected_spans(text, surfaces)  # raises if out of order
            cursor = 0
            for span in spans:
                start, end = divmod(span, 1000)
                gap = text[cursor:start]
                assert set(gap) <= _PUNCT, (
                    f"s{sid}: non-punct gap {gap!r} before offset {start}"
                )
                cursor = end
            assert set(text[cursor:]) <= _PUNCT, f"s{sid}: trailing residue"

    def test_tokens_concatenate_within_sentence(self):
        for sid, _register, text, surfaces in PARITY_CORPUS:
            for s in surfaces:
                assert s in text, f"s{sid}: token {s!r} not in sentence"

    def test_predicted_spans_partition_like_expected(self):
        """Engine spans obey the same no-overlap in-order invariant."""
        for sid, _register, text, _surfaces in PARITY_CORPUS:
            spans = predicted_spans(text)
            last_end = 0
            for span in spans:
                start, end = divmod(span, 1000)
                assert start >= last_end, f"s{sid}: overlapping pred span"
                assert end > start
                last_end = end


class TestRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        """The recapture guard: T22_EXPECTED (the t22 oracle constants)
        must equal a live recomputation — a dictionary/matrix change that
        re-segments the corpus fails here until the constants are
        re-recorded (and the F1 floor re-checked)."""
        assert compute_expected() == T22_EXPECTED

    def test_micro_f1_floor(self):
        f1 = micro_f1(T22_EXPECTED)
        assert f1 >= T22_F1_FLOOR, (
            f"external segmentation parity regressed: micro-F1 {f1:.6f} "
            f"< floor {T22_F1_FLOOR}"
        )

    def test_total_row_is_register_sum(self):
        total = T22_EXPECTED["__total__"]
        sums = [0, 0, 0, 0]
        for reg, row in T22_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == total


class TestT22Catalog:
    def test_t22_matches_oracle_values(self, spark):
        """The Spark entry reproduces the recorded aggregates exactly
        (same check the driver's DuckDB oracle performs)."""
        from hive_udf_neologd_spark.operators.textops import (
            t22_segmentation_parity,
        )

        rows = t22_segmentation_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (r["n_sent"], r["tp"], r["n_pred"], r["n_exp"])
            for r in rows
        }
        assert got == T22_EXPECTED
        for r in rows:
            n, tp, n_pred, n_exp = (
                r["n_sent"], r["tp"], r["n_pred"], r["n_exp"],
            )
            assert r["f1"] == pytest.approx(2 * tp / (n_pred + n_exp))
