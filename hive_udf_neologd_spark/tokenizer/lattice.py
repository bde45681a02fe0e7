"""Viterbi lattice segmentation.

The computed semantics of the reference's ``JapaneseTokenizer(userDict,
discardPunctuation=true, mode)`` (SURVEY.md §2.2 row 1): minimum-cost path
over dictionary + unknown-word nodes, with

* NORMAL — plain Viterbi;
* SEARCH — extra penalty on long kanji/compound dictionary nodes so that
  compounds decompose when component entries exist (Kuromoji search-mode
  penalties: kanji length > 2 → +3100, other length > 7 → +1700);
* EXTENDED — search penalties plus unknown words emitted as 1-gram
  characters;
* DEFAULT — alias for SEARCH (``JapaneseTokenizer.DEFAULT_MODE``,
  KuromojiNEologdUDF.java:188-189).

Unknown-word handling follows IPADIC char.def semantics (SURVEY.md §2.2):
katakana/latin/digit/hiragana runs group; kanji does not group (candidates
of length 1-2); punctuation nodes are emitted but marked, and dropped by the
tokenizer (discardPunctuation=true).
"""

from __future__ import annotations

from dataclasses import dataclass

from hive_udf_neologd_spark.tokenizer import chardef
from hive_udf_neologd_spark.tokenizer.dictionary import DictEntry, Dictionary, UserDictionary

NORMAL = "normal"
SEARCH = "search"
EXTENDED = "extended"

_INF = float("inf")

# Search-mode penalties (Kuromoji JapaneseTokenizer constants).
_SEARCH_KANJI_LENGTH = 2
_SEARCH_KANJI_PENALTY = 3100
_SEARCH_OTHER_LENGTH = 7
_SEARCH_OTHER_PENALTY = 1700


@dataclass(frozen=True)
class Token:
    surface: str       # raw surface in the input text
    term: str          # output term before filters (norm-applied)
    pos: str
    base_form: str | None
    reading: str | None
    is_punct: bool
    is_unknown: bool


@dataclass(frozen=True)
class _Node:
    length: int
    cost: int
    entry: DictEntry | None  # None → unknown/punct node
    pos: str
    is_punct: bool = False


def _unknown_nodes(text: str, i: int, mode: str) -> list[_Node]:
    ch = text[i]
    cls = chardef.char_class(ch)
    if cls == chardef.PUNCT:
        # Group a run of punctuation/whitespace into one discardable node.
        j = i + 1
        while j < len(text) and chardef.char_class(text[j]) == chardef.PUNCT:
            j += 1
        return [_Node(j - i, 0, None, "記号-一般", is_punct=True)]

    run = i + 1
    while run < len(text) and chardef.char_class(text[run]) == cls:
        run += 1
    run_len = run - i

    pos_by_class = {
        chardef.KANJI: "名詞-一般",
        chardef.HIRAGANA: "名詞-一般",
        chardef.KATAKANA: "名詞-一般",
        chardef.LATIN: "名詞-一般",
        chardef.DIGIT: "名詞-数",
        chardef.OTHER: "名詞-一般",
    }
    pos = pos_by_class[cls]
    nodes: list[_Node] = []

    if mode == EXTENDED:
        # Extended mode: unknown words become unigrams (Kuromoji EXTENDED).
        nodes.append(_Node(1, 3000, None, pos))
        return nodes

    if cls == chardef.KANJI:
        # char.def: KANJI group=0 length=2 → candidates of length 1..2.
        for ln in (1, 2):
            if ln <= run_len:
                nodes.append(_Node(ln, 3500 + 1700 * ln, None, pos))
    elif cls in chardef.GROUPING:
        # Full-run grouped candidate (cheapest per char) ...
        nodes.append(_Node(run_len, 3000 + 500 * run_len, None, pos))
        # ... plus short prefixes so embedded dictionary words can win.
        for ln in (1, 2, 3):
            if ln < run_len:
                nodes.append(_Node(ln, 3500 + 900 * ln, None, pos))
    else:
        nodes.append(_Node(1, 6000, None, pos))
    return nodes


def _search_penalty(entry: DictEntry, mode: str) -> int:
    if mode not in (SEARCH, EXTENDED):
        return 0
    s = entry.surface
    n = len(s)
    if n > _SEARCH_KANJI_LENGTH and all(
        chardef.char_class(c) == chardef.KANJI for c in s
    ):
        # Flat Kuromoji penalty plus a length term so long compounds
        # (関西国際空港) decompose whenever component entries exist, while
        # 3-char words without parts (図書館) stay whole.
        return _SEARCH_KANJI_PENALTY + 1000 * (n - 3)
    if n > _SEARCH_OTHER_LENGTH:
        return _SEARCH_OTHER_PENALTY
    return 0


class Lattice:
    """Minimum-cost segmenter over (built-in dict + user dict + unknowns)."""

    def __init__(self, dictionary: Dictionary, user_dict: UserDictionary | None, mode: str):
        self._dict = dictionary
        self._mode = mode
        self._user = Dictionary(user_dict.entries) if user_dict and user_dict.entries else None

    def ascii_matchable_surfaces(self) -> tuple[str, ...]:
        """All (built-in + user) surfaces that could match inside a pure
        alnum-ASCII line.  For a line containing none of them as a
        substring, Viterbi provably reduces to character-class run
        splitting (see analyzer fast path)."""
        out = self._dict.ascii_matchable_surfaces()
        if self._user is not None:
            out = out + self._user.ascii_matchable_surfaces()
        return out

    def segment(self, text: str) -> list[Token]:
        n = len(text)
        if n == 0:
            return []
        best = [_INF] * (n + 1)
        best[0] = 0.0
        back: list[tuple[int, _Node] | None] = [None] * (n + 1)

        for i in range(n):
            if best[i] is _INF:
                continue
            base = best[i]
            cands: list[_Node] = []
            if self._user is not None:
                for e in self._user.prefix_matches(text, i):
                    cands.append(_Node(e.length, e.cost, e, e.pos))
            for e in self._dict.prefix_matches(text, i):
                cands.append(_Node(e.length, e.cost + _search_penalty(e, self._mode), e, e.pos))
            cands.extend(_unknown_nodes(text, i, self._mode))
            for node in cands:
                j = i + node.length
                c = base + node.cost
                if c < best[j]:
                    best[j] = c
                    back[j] = (i, node)

        # Backtrack (every position is reachable: unknown nodes always exist).
        path: list[tuple[int, _Node]] = []
        j = n
        while j > 0:
            i, node = back[j]  # type: ignore[misc]
            path.append((i, node))
            j = i
        path.reverse()

        # SEARCH/EXTENDED compound-as-synonym emission (Lucene 5.5.5
        # Mode.SEARCH javadoc: decompounding "also including the full
        # compound token as a synonym"; outputCompounds is true for both
        # SEARCH and EXTENDED).  The reference drains every term from the
        # stream (KuromojiNEologdUDF.java:306-316), so its SEARCH output
        # contains compound AND parts.  Interpretation pinned here (the
        # reference's own tests never pin SEARCH output,
        # KuromojiNEologdUDFTest.java only checks the mode arg): wherever
        # the chosen path splits a span that a single *penalized* built-in
        # dictionary entry covers exactly (≥2 consecutive parts), emit
        # that entry's token first, then its parts — the compound sits at
        # the first part's position with positionLength = #parts in
        # Lucene's graph, and longer-token-first is its surface order.
        # User-dictionary compounds are excluded: Lucene always applies
        # the user segmentation without a synonym compound.
        compounds: dict[int, Token] = {}
        if self._mode in (SEARCH, EXTENDED):
            end_to_idx = {i + node.length: k for k, (i, node) in enumerate(path)}
            for k, (i, node) in enumerate(path):
                best_e = None
                for e in self._dict.prefix_matches(text, i):
                    if e.length == node.length:
                        continue  # the path kept the compound itself
                    if _search_penalty(e, self._mode) <= 0:
                        continue  # not a decompounding candidate
                    kk = end_to_idx.get(i + e.length)
                    if kk is None or kk <= k:
                        continue  # does not align with ≥2 chosen parts
                    if best_e is None or e.length > best_e.length:
                        best_e = e
                if best_e is not None:
                    surf = text[i : i + best_e.length]
                    compounds[k] = Token(
                        surf,
                        best_e.norm if best_e.norm is not None else surf,
                        best_e.pos,
                        best_e.base_form,
                        None,
                        is_punct=False,
                        is_unknown=False,
                    )

        tokens: list[Token] = []
        for k, (i, node) in enumerate(path):
            if k in compounds:
                tokens.append(compounds[k])
            surface = text[i : i + node.length]
            if node.is_punct:
                continue  # discardPunctuation=true
            e = node.entry
            if e is not None and e.segments:
                # User-dictionary segmentation: emit each segment as a token.
                off = i
                for seg, reading in e.segments:
                    tokens.append(
                        Token(seg, seg, e.pos, None, reading, is_punct=False, is_unknown=False)
                    )
                    off += len(seg)
                continue
            if e is not None:
                term = e.norm if e.norm is not None else surface
                tokens.append(
                    Token(surface, term, e.pos, e.base_form, None,
                          is_punct=False, is_unknown=False)
                )
            else:
                tokens.append(
                    Token(surface, surface, node.pos, None, None,
                          is_punct=False, is_unknown=True)
                )
        return tokens
