"""Generalized deverbal-orphan sweep (round 12, VERDICT r11 #3).

The round-11 sweep (wave 427) scanned only the *deverbal seed lists* —
nouns seeded elsewhere (釣り in the hobby tier) never had their source
verb checked, which is exactly how 釣る shipped shredded while 釣り was
a plain noun row.  This tool is the mechanical closure the verdict
asked for: scan EVERY noun row in the BUILT dictionary (snapshot CSV +
hand lexicon — not seed lists) whose surface has a productive 連用形
shape, derive the candidate source verb(s), and flag surfaces where

  1. no verb row shares the stem (no 動詞 row whose base_form or
     surface equals the candidate), AND
  2. the candidate verb SHREDS when probed through the live engine
     (its 基本形 does not come back as one token).

Output is a CANDIDATE list for human adjudication — the derivation
(is the candidate real Japanese, is it IPADIC?) stays a documented
per-item argument, exactly like every dictionary wave.  Usage:

    PYTHONPATH=/root/repo python tools/orphan_sweep.py

Derivation notes baked into the shapes below:

* godan 連用形 = stem + i-row kana → candidate verb = stem + u-row
  twin (釣り→釣る, 梳かし→梳かす, 泳ぎ→泳ぐ, 書き→書く …);
* ichidan 連用形 = the stem itself, ending i-row or e-row kana →
  candidate verb = surface + る (眺め→眺める, 答え→答える);
* single-kana "stems" are skipped (み→みる-style candidates are the
  unknown-heuristics' domain and all real ones are long lexicalized);
* the り→る godan twin and the ichidan +る candidate can both exist
  (借り → 借る?/借りる) — both are emitted, adjudication picks.
"""

from __future__ import annotations

import sys

# i-row kana → u-row godan 基本形 ending.
_GODAN_IU = {
    "き": "く", "ぎ": "ぐ", "し": "す", "ち": "つ", "に": "ぬ",
    "ひ": "ふ", "び": "ぶ", "み": "む", "り": "る", "い": "う",
}
# ichidan stems end in i-row or e-row kana.
_ICHIDAN_TAIL = set(_GODAN_IU) | set("えけせてねへめれげぜでべぺ")


def candidate_verbs(surface: str) -> list[str]:
    if len(surface) < 2:
        return []
    tail = surface[-1]
    out = []
    if tail in _GODAN_IU:
        out.append(surface[:-1] + _GODAN_IU[tail])
    if tail in _ICHIDAN_TAIL:
        out.append(surface + "る")
    return out


def main() -> int:
    from hive_udf_neologd_spark.tokenizer.analyzer import JapaneseAnalyzer
    from hive_udf_neologd_spark.tokenizer.dictionary import builtin_dictionary

    dic = builtin_dictionary()
    entries = dic._entries if hasattr(dic, "_entries") else None
    if entries is None:
        # Fall back to the public prefix tables.
        entries = [e for hits in dic._by_surface.values() for e in hits]

    verb_forms: set[str] = set()
    for e in entries:
        if e.pos.startswith("動詞"):
            verb_forms.add(e.surface)
            if e.base_form:
                verb_forms.add(e.base_form)

    noun_surfaces: list[str] = sorted(
        {
            e.surface
            for e in entries
            if e.pos.startswith("名詞")
            and "接尾" not in e.pos
            and "数" not in e.pos
            and "代名詞" not in e.pos
            and "固有名詞" not in e.pos
        }
    )

    analyzer = JapaneseAnalyzer(stop_words=[], stop_tags=[])

    import re

    # The orphan class lives on SIMPLE deverbal shapes: one kanji stem +
    # 1-2 okurigana (釣り, 梳かし, 勤め).  Compound nouns (一本釣り) are
    # derivatives — fixing the simple stem fixes them all, and their
    # candidate "verbs" (一本釣る) flood the report with clean parses of
    # real component words.
    _SHAPE = re.compile(r"^[一-鿿][ぁ-ん]{1,2}$")

    flagged: list[tuple[str, str, str]] = []
    n_checked = 0
    for noun in noun_surfaces:
        if not _SHAPE.match(noun):
            continue
        cands = candidate_verbs(noun)
        # If ANY candidate is a live verb (surface or base form), the
        # noun HAS its source verb — not an orphan (働き/借り/占い all
        # exit here through 働く/借りる/占う).  Only nouns with no verb
        # on either derivation path proceed to the probe.
        if not cands or any(v in verb_forms for v in cands):
            continue
        for verb in cands:
            n_checked += 1
            rich = analyzer.analyze_rich(verb + "。")
            # Orphan signature: the probe parse leaves an UNKNOWN piece
            # (釣る → 釣+る both unknown).  A clean parse into known
            # rows (一人勝つ → 一人|勝つ) is not an orphan — the
            # candidate either is not a word or already reads through
            # real rows; either way there is nothing to wave.
            if not any(t["unknown"] for t in rich):
                continue
            toks = "|".join(t["surface"] for t in rich)
            flagged.append((noun, verb, toks))

    print(f"# nouns scanned: {len(noun_surfaces)}, "
          f"verb candidates probed: {n_checked}, flagged: {len(flagged)}")
    for noun, verb, toks in flagged:
        print(f"{noun}\t{verb}\t{toks}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
