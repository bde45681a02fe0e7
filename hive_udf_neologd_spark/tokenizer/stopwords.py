"""Default Japanese stop-word and POS stop-tag sets.

The reference gets these from ``JapaneseAnalyzer.getDefaultStopSet()`` /
``getDefaultStopTags()`` (used when the stopWords / stopTags UDF args are
null — KuromojiNEologdUDF.java:95-100, 132).  These are vendored equivalents
of the Lucene 5.5.5 kuromoji defaults (public ``stopwords.txt`` /
``stoptags.txt`` resources), pinned here as engine data.

Tri-state semantics (SURVEY.md §1.2):
  * ``None``  → use these defaults
  * ``[]``    → disable the filter entirely
  * custom list → use exactly that list (stop words: case-insensitive,
    KuromojiNEologdUDF.java:203 ``ignoreCase=true``)
"""

# Lucene kuromoji stopwords.txt (5.5.5) — Japanese function words.
DEFAULT_STOP_WORDS = frozenset({
    "の", "に", "は", "を", "た", "が", "で", "て", "と", "し", "れ", "さ",
    "ある", "いる", "も", "する", "から", "な", "こと", "として", "い", "や",
    "れる", "など", "なっ", "ない", "この", "ため", "その", "あっ", "よう",
    "また", "もの", "という", "あり", "まで", "られ", "なる", "へ", "か",
    "だ", "これ", "によって", "により", "おり", "より", "による", "ず",
    "なり", "られる", "において", "ば", "なかっ", "なく", "しかし",
    "について", "せ", "だっ", "その後", "できる", "それ", "う", "ので",
    "なお", "のみ", "でき", "き", "つ", "における", "および", "いう",
    "さらに", "でも", "ら", "たり", "その他", "に関する", "たち", "ます",
    "ん", "なら", "に対して", "特に", "せる", "及び", "これら", "とき",
    "では", "にて", "ほか", "ながら", "うち", "そして", "とともに",
    "ただし", "かつて", "それぞれ", "または", "お", "ほど", "ものの",
    "に対する", "ほとんど", "と共に", "といった", "です", "とも",
    "ところ", "ここ",
})

# Lucene kuromoji stoptags.txt (5.5.5) — the uncommented default entries:
# conjunctions, all particle subtypes, auxiliary verbs, all symbol subtypes,
# interjection fillers, non-verbal sounds.  Matching is EXACT on the token's
# full hierarchical POS string (JapanesePartOfSpeechStopFilter semantics).
DEFAULT_STOP_TAGS = frozenset({
    "接続詞",
    "助詞",
    "助詞-格助詞",
    "助詞-格助詞-一般",
    "助詞-格助詞-引用",
    "助詞-格助詞-連語",
    "助詞-接続助詞",
    "助詞-係助詞",
    "助詞-副助詞",
    "助詞-間投助詞",
    "助詞-並立助詞",
    "助詞-終助詞",
    "助詞-副助詞／並立助詞／終助詞",
    "助詞-連体化",
    "助詞-副詞化",
    "助詞-特殊",
    "助動詞",
    "記号",
    "記号-一般",
    "記号-読点",
    "記号-句点",
    "記号-空白",
    "記号-括弧開",
    "記号-括弧閉",
    "その他-間投",
    "フィラー",
    "非言語音",
})
