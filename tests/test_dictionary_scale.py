"""NEologd-scale dictionary simulation — standing gates (VERDICT r6
next-round #2).

Round 6 measured ad hoc that the prefix-dictionary + lattice hold up at a
simulated 530k-entry load (BASELINE.md round-6 kernel table:
1.94 µs/position, 0.87 s build).  This module makes that proof standing:
the ×9 suffix-mutated snapshot is a fixture, and BUILD TIME, PROBE
BOUNDEDNESS and LATTICE THROUGHPUT are gated so the real-NEologd swap-in
(``load_mecab_csv`` ingesting a ~3.2M-surface CSV, reference
``build.sh:104-159``) has a proof at scale instead of a one-off note.

Gates are ~3-5× above the round-6/7 measurements to absorb shared-host
noise while still catching structural regressions (an O(bucket-size) scan
sneaking back into prefix_matches would blow every gate by 10-100×).
"""

from __future__ import annotations

import time

import pytest

from hive_udf_neologd_spark.tokenizer.dictionary import (
    Dictionary,
    builtin_dictionary,
    snapshot_entries,
)

# Distinct single-kana suffixes — real Japanese codepoints so char-class
# logic sees ordinary text; 8 mutations + the original ≈ ×9 (the round-6
# protocol).
_SUFFIXES = "ゃゅょァィゥェォ"


@pytest.fixture(scope="module")
def scaled_entries():
    base = list(snapshot_entries())
    assert len(base) > 50_000, "snapshot asset missing?"
    out = list(base)
    for k, suf in enumerate(_SUFFIXES):
        out.extend(e._replace(surface=e.surface + suf) for e in base)
    return out


@pytest.mark.slow
class TestNeologdScaleSimulation:
    def test_build_time_at_530k(self, scaled_entries):
        assert len(scaled_entries) > 500_000
        t0 = time.perf_counter()
        d = Dictionary(scaled_entries)
        build_s = time.perf_counter() - t0
        # Round 6/7 measure ~0.9 s; gate at 5 s (shared-host headroom).
        assert build_s < 5.0, f"530k dictionary build took {build_s:.2f}s"
        assert len(d._by_surface) > 500_000

    def test_probe_count_stays_bounded(self, scaled_entries):
        """prefix_matches cost is len(length-set) hash probes per
        position — independent of bucket population.  At ×9 the length
        sets grow by at most the suffix lengths; the bound must stay
        O(10), not O(bucket)."""
        d = Dictionary(scaled_entries)
        worst = max(len(lens) for lens in d._lens_by_first.values())
        assert worst <= 25, f"worst per-position probe count {worst}"

    def test_lattice_throughput_at_530k(self, scaled_entries):
        from hive_udf_neologd_spark.tokenizer.goldens import T18_POOL
        from hive_udf_neologd_spark.tokenizer.lattice import Lattice

        d = Dictionary(scaled_entries)
        lat = Lattice(d, None, "normal")
        # Warmup + correctness: segmentation must still partition input.
        for text in T18_POOL:
            toks = lat.segment(text)
            assert "".join(t.surface for t in toks if not t.is_punct)
        reps = 25
        n_chars = sum(len(t) for t in T18_POOL) * reps
        t0 = time.perf_counter()
        for _ in range(reps):
            for text in T18_POOL:
                lat.segment(text)
        dt = time.perf_counter() - t0
        per_pos_us = dt / n_chars * 1e6
        # Round-6 kernel table: 1.94 µs/position at 530k.  Gate at 10 µs.
        assert per_pos_us < 10.0, f"{per_pos_us:.2f} µs/position at 530k"

    def test_output_unchanged_by_scale_load(self, scaled_entries):
        """The ×9 load adds only suffix-mutated surfaces, which can tie
        but never undercut an original row on cost — the pinned reference
        goldens must be byte-identical under the 530k dictionary."""
        from hive_udf_neologd_spark.tokenizer.analyzer import JapaneseAnalyzer
        from hive_udf_neologd_spark.tokenizer.dictionary import DictEntry
        from hive_udf_neologd_spark.tokenizer.goldens import T18_POOL, T18_TOKENS
        from hive_udf_neologd_spark.tokenizer.lexicon import BUILTIN_ENTRIES

        base = JapaneseAnalyzer()
        # Hand lexicon first + scaled snapshot: same registration order as
        # builtin_dictionary, so cost ties keep the pinned winner.
        entries = [DictEntry(s, p, c, b, n) for (s, p, c, b, n) in BUILTIN_ENTRIES]
        entries.extend(scaled_entries)
        big = JapaneseAnalyzer(dictionary=Dictionary(entries))
        for pid, text in enumerate(T18_POOL):
            assert tuple(big.tokenize(text)) == T18_TOKENS[pid], pid
        assert base.tokenize("きゃりーぱみゅぱみゅ。") == ["きゃりーぱみゅぱみゅ"]
        assert big.tokenize("きゃりーぱみゅぱみゅ。") == ["きゃりーぱみゅぱみゅ"]
