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
_PUNCT = set("。、．，・「」『』（）()！？!?　 　…―ー-：:；;〜★％№･")  # round-12
# ho10_sym additions: 〜 (U+301C Pd), ★ (So), ％ (Po), № (So), ･ (U+FF65
# Po) — all in Lucene's discardPunctuation categories, legal BETWEEN
# expected tokens.


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


class TestAllModesOverCorpus:
    @pytest.mark.parametrize("mode", ["normal", "search", "extended"])
    def test_every_sentence_partitions_in_every_mode(self, mode):
        """The 250-sentence corpus is the richest pinned Japanese text in
        the repo — run it through ALL THREE modes: no crash, and the
        non-punct surfaces must partition the input in order (the
        TestLatticeFuzz invariant on real prose).  SEARCH/EXTENDED emit
        compound synonyms BEFORE their parts, so the partition check
        skips a token whose span equals the following tokens' combined
        span (the synonym)."""
        from hive_udf_neologd_spark.tokenizer.analyzer import JapaneseAnalyzer

        analyzer = JapaneseAnalyzer(mode=mode, stop_words=[], stop_tags=[])
        for sid, _register, text, _surfaces in PARITY_CORPUS:
            toks = analyzer._lattice.segment(text)
            cursor = 0
            i = 0
            while i < len(toks):
                s = toks[i].surface
                idx = text.find(s, cursor)
                assert idx >= 0, (mode, sid, s)
                # Synonym compound: the NEXT tokens must TILE this exact
                # span (NORMAL never emits synonyms, so no skip there).
                # The old prefix-only check false-positived on たかっ+た
                # (tranche-2 s551): た is a prefix of たかっ but not a
                # decompounding of it.
                if mode != "normal" and i + 1 < len(toks):
                    span_end = idx + len(s)
                    j, c2 = i + 1, idx
                    while j < len(toks) and c2 < span_end:
                        nidx = text.find(toks[j].surface, c2)
                        if nidx != c2:
                            break
                        c2 = nidx + len(toks[j].surface)
                        j += 1
                    if c2 == span_end and j > i + 1:
                        i += 1
                        continue  # parts will advance the cursor
                cursor = idx + len(s)
                i += 1
            residue = text[cursor:]
            assert all(not ("一" <= c <= "鿿" or "ぁ" <= c <= "ヺ")
                       for c in residue), (mode, sid, residue)


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


# --- held-out SEARCH/EXTENDED mode-parity corpus (VERDICT r8 #1) -----------


class TestModeCorpusIntegrity:
    def test_shape(self):
        from hive_udf_neologd_spark.tokenizer.mode_parity import (
            MODE_PARITY_CORPUS,
        )

        sids = [sid for sid, *_ in MODE_PARITY_CORPUS]
        assert len(sids) == len(set(sids))
        assert len(sids) >= 100
        modes = {m for _s, _r, m, _t, _e in MODE_PARITY_CORPUS}
        assert modes == {"search", "extended"}
        registers = {r for _s, r, _m, _t, _e in MODE_PARITY_CORPUS}
        assert len(registers) >= 15

    def test_expectations_are_well_formed_emissions(self):
        """Every expected sequence admits a span assignment where maximal
        spans tile the non-punct text and nested groups (compound →
        parts) exactly tile their container — a typo fails HERE, loudly,
        not silently in the accuracy."""
        from hive_udf_neologd_spark.tokenizer.mode_parity import (
            MODE_PARITY_CORPUS,
            validate_emission,
        )

        for sid, _reg, _mode, text, surfaces in MODE_PARITY_CORPUS:
            validate_emission(text, surfaces)  # raises on malformation

    def test_no_dictionary_straddlers(self):
        """No committed dictionary entry (>=2 chars) crosses an expected
        maximal-token boundary — the authoring audit, kept as a gate so a
        future dictionary wave that introduces a crossing entry resurfaces
        the affected sentence for re-derivation instead of silently
        flipping its path."""
        from hive_udf_neologd_spark.tokenizer.dictionary import (
            builtin_dictionary,
        )
        from hive_udf_neologd_spark.tokenizer.mode_parity import (
            MODE_PARITY_CORPUS,
            validate_emission,
        )

        by = builtin_dictionary()._by_surface
        for sid, _reg, _mode, text, surfaces in MODE_PARITY_CORPUS:
            spans = validate_emission(text, surfaces)
            maximal = [
                s for s in spans
                if not any(o != s and o[0] <= s[0] and s[1] <= o[1] for o in spans)
            ]
            bounds = sorted({b for _a, b in maximal})
            for i in range(len(text)):
                for j in range(i + 2, len(text) + 1):
                    if text[i:j] in by:
                        assert not any(i < b < j for b in bounds), (
                            f"#{sid}: dict entry {text[i:j]!r} straddles an "
                            f"expected boundary in {text!r}"
                        )


class TestModeRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        """Recapture guard — identical contract to T22_EXPECTED."""
        from hive_udf_neologd_spark.tokenizer.mode_parity import (
            T25_EXPECTED,
            compute_expected,
        )

        assert compute_expected() == T25_EXPECTED

    def test_accuracy_floor(self):
        from hive_udf_neologd_spark.tokenizer.mode_parity import (
            T25_ACC_FLOOR,
            T25_EXPECTED,
            accuracy,
        )

        acc = accuracy(T25_EXPECTED)
        assert acc >= T25_ACC_FLOOR, (
            f"held-out mode parity regressed: accuracy {acc:.6f} "
            f"< floor {T25_ACC_FLOOR}"
        )

    def test_total_row_is_register_sum(self):
        from hive_udf_neologd_spark.tokenizer.mode_parity import T25_EXPECTED

        sums = [0, 0, 0, 0]
        for reg, row in T25_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == T25_EXPECTED["__total__"]


class TestT25Catalog:
    def test_t25_matches_oracle_values(self, spark):
        from hive_udf_neologd_spark.operators.textops import t25_mode_parity
        from hive_udf_neologd_spark.tokenizer.mode_parity import T25_EXPECTED

        rows = t25_mode_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (
                r["n_sent"], r["n_match"], r["n_tok_exp"], r["n_tok_pred"],
            )
            for r in rows
        }
        assert got == T25_EXPECTED
        for r in rows:
            assert r["acc"] == pytest.approx(r["n_match"] / r["n_sent"])


# --- held-out LEMMA-parity corpus (round 9, third axis) --------------------


class TestLemmaRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        from hive_udf_neologd_spark.tokenizer.lemma_parity import (
            T27_EXPECTED,
            compute_expected,
        )

        assert compute_expected() == T27_EXPECTED

    def test_accuracy_floor(self):
        from hive_udf_neologd_spark.tokenizer.lemma_parity import (
            T27_ACC_FLOOR,
            T27_EXPECTED,
            accuracy,
        )

        acc = accuracy(T27_EXPECTED)
        assert acc >= T27_ACC_FLOOR, (
            f"held-out lemma parity regressed: accuracy {acc:.6f} "
            f"< floor {T27_ACC_FLOOR}"
        )

    def test_shape_and_hygiene(self):
        from hive_udf_neologd_spark.tokenizer.lemma_parity import (
            LEMMA_PARITY_CORPUS,
        )

        sids = [sid for sid, *_ in LEMMA_PARITY_CORPUS]
        assert len(sids) == len(set(sids))
        assert len(sids) >= 40
        # Terms are post-chain (lemmatized/folded/stemmed/lowered), so a
        # substring check would be wrong; the hygiene gate here is
        # non-emptiness and no stray whitespace.
        for _sid, _reg, text, terms in LEMMA_PARITY_CORPUS:
            assert text and terms
            for t in terms:
                assert t == t.strip() and t

    def test_total_row_is_register_sum(self):
        from hive_udf_neologd_spark.tokenizer.lemma_parity import T27_EXPECTED

        sums = [0, 0, 0, 0]
        for reg, row in T27_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == T27_EXPECTED["__total__"]


class TestT27Catalog:
    def test_t27_matches_oracle_values(self, spark):
        from hive_udf_neologd_spark.operators.textops import t27_lemma_parity
        from hive_udf_neologd_spark.tokenizer.lemma_parity import T27_EXPECTED

        rows = t27_lemma_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (
                r["n_sent"], r["n_match"], r["n_tok_exp"], r["n_tok_pred"],
            )
            for r in rows
        }
        assert got == T27_EXPECTED
        for r in rows:
            assert r["acc"] == pytest.approx(r["n_match"] / r["n_sent"])


# --- held-out READING-parity corpus (round 10, fourth axis) ----------------


class TestReadingRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        from hive_udf_neologd_spark.tokenizer.reading_parity import (
            T28_EXPECTED,
            compute_expected,
        )

        assert compute_expected() == T28_EXPECTED

    def test_accuracy_floor(self):
        from hive_udf_neologd_spark.tokenizer.reading_parity import (
            T28_ACC_FLOOR,
            T28_EXPECTED,
            accuracy,
        )

        acc = accuracy(T28_EXPECTED)
        assert acc >= T28_ACC_FLOOR, (
            f"held-out reading parity regressed: accuracy {acc:.6f} "
            f"< floor {T28_ACC_FLOOR}"
        )

    def test_shape_and_hygiene(self):
        from hive_udf_neologd_spark.tokenizer.reading_parity import (
            READING_PARITY_CORPUS,
        )

        sids = [sid for sid, *_ in READING_PARITY_CORPUS]
        assert len(sids) == len(set(sids))
        assert len(sids) >= 35
        for _sid, _reg, text, pairs in READING_PARITY_CORPUS:
            assert text and pairs
            for surface, reading in pairs:
                assert surface == surface.strip() and surface
                if reading is not None:
                    # Readings are katakana (+ー) only — the same check
                    # the generator enforces on the authored tier.
                    assert reading and all(
                        0x30A1 <= ord(c) <= 0x30FA or c == "ー"
                        for c in reading
                    ), (surface, reading)

    def test_total_row_is_register_sum(self):
        from hive_udf_neologd_spark.tokenizer.reading_parity import (
            T28_EXPECTED,
        )

        sums = [0, 0, 0, 0]
        for reg, row in T28_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == T28_EXPECTED["__total__"]


class TestT28Catalog:
    def test_t28_matches_oracle_values(self, spark):
        from hive_udf_neologd_spark.operators.textops import (
            t28_reading_parity,
        )
        from hive_udf_neologd_spark.tokenizer.reading_parity import (
            T28_EXPECTED,
        )

        rows = t28_reading_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (
                r["n_sent"], r["n_match"], r["n_tok_exp"], r["n_tok_pred"],
            )
            for r in rows
        }
        assert got == T28_EXPECTED
        for r in rows:
            assert r["acc"] == pytest.approx(r["n_match"] / r["n_sent"])


# --- held-out USER-DICT parity corpus (round 10, fifth axis) ---------------


class TestUserdictRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        from hive_udf_neologd_spark.tokenizer.userdict_parity import (
            T29_EXPECTED,
            compute_expected,
        )

        assert compute_expected() == T29_EXPECTED

    def test_accuracy_floor(self):
        from hive_udf_neologd_spark.tokenizer.userdict_parity import (
            T29_ACC_FLOOR,
            T29_EXPECTED,
            accuracy,
        )

        acc = accuracy(T29_EXPECTED)
        assert acc >= T29_ACC_FLOOR, (
            f"held-out user-dict parity regressed: accuracy {acc:.6f} "
            f"< floor {T29_ACC_FLOOR}"
        )

    def test_shape_and_hygiene(self):
        from hive_udf_neologd_spark.tokenizer.userdict_parity import (
            UD_PARITY_CORPUS,
        )

        sids = [sid for sid, *_ in UD_PARITY_CORPUS]
        assert len(sids) == len(set(sids))
        assert len(sids) >= 26
        for _sid, _reg, mode, ud_rows, text, pairs in UD_PARITY_CORPUS:
            assert mode in ("normal", "search", "extended")
            assert text and pairs
            for row in ud_rows:
                # Valid 4-field user-dict rows whose segments concatenate
                # to the surface — the loader's own contract.
                parts = [p.strip() for p in row.split(",")]
                assert len(parts) >= 4
                assert "".join(parts[1].split()) == parts[0]

    def test_total_row_is_register_sum(self):
        from hive_udf_neologd_spark.tokenizer.userdict_parity import (
            T29_EXPECTED,
        )

        sums = [0, 0, 0, 0]
        for reg, row in T29_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == T29_EXPECTED["__total__"]


class TestT29Catalog:
    def test_t29_matches_oracle_values(self, spark):
        from hive_udf_neologd_spark.operators.textops import (
            t29_userdict_parity,
        )
        from hive_udf_neologd_spark.tokenizer.userdict_parity import (
            T29_EXPECTED,
        )

        rows = t29_userdict_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (
                r["n_sent"], r["n_match"], r["n_tok_exp"], r["n_tok_pred"],
            )
            for r in rows
        }
        assert got == T29_EXPECTED
        for r in rows:
            assert r["acc"] == pytest.approx(r["n_match"] / r["n_sent"])


# --- held-out POS parity corpus (round 10, sixth axis) ---------------------


class TestPosRecordedAggregates:
    def test_recorded_matches_live_engine(self):
        from hive_udf_neologd_spark.tokenizer.pos_parity import (
            T30_EXPECTED,
            compute_expected,
        )

        assert compute_expected() == T30_EXPECTED

    def test_accuracy_floor(self):
        from hive_udf_neologd_spark.tokenizer.pos_parity import (
            T30_ACC_FLOOR,
            T30_EXPECTED,
            accuracy,
        )

        acc = accuracy(T30_EXPECTED)
        assert acc >= T30_ACC_FLOOR, (
            f"held-out POS parity regressed: accuracy {acc:.6f} "
            f"< floor {T30_ACC_FLOOR}"
        )

    def test_shape_and_hygiene(self):
        from hive_udf_neologd_spark.tokenizer.pos_parity import (
            POS_PARITY_CORPUS,
        )

        sids = [sid for sid, *_ in POS_PARITY_CORPUS]
        assert len(sids) == len(set(sids))
        assert len(sids) >= 25
        for _sid, _reg, text, pairs in POS_PARITY_CORPUS:
            assert text and pairs
            for surface, pos in pairs:
                assert surface == surface.strip() and surface
                # POS strings are hyphen-joined IPADIC levels.
                assert pos and " " not in pos

    def test_total_row_is_register_sum(self):
        from hive_udf_neologd_spark.tokenizer.pos_parity import T30_EXPECTED

        sums = [0, 0, 0, 0]
        for reg, row in T30_EXPECTED.items():
            if reg == "__total__":
                continue
            for i in range(4):
                sums[i] += row[i]
        assert tuple(sums) == T30_EXPECTED["__total__"]


class TestT30Catalog:
    def test_t30_matches_oracle_values(self, spark):
        from hive_udf_neologd_spark.operators.textops import t30_pos_parity
        from hive_udf_neologd_spark.tokenizer.pos_parity import T30_EXPECTED

        rows = t30_pos_parity(spark, "/root/testdata/sf0.001").collect()
        got = {
            r["register"]: (
                r["n_sent"], r["n_match"], r["n_tok_exp"], r["n_tok_pred"],
            )
            for r in rows
        }
        assert got == T30_EXPECTED
        for r in rows:
            assert r["acc"] == pytest.approx(r["n_match"] / r["n_sent"])
