"""Built-in lexicon — the engine's pinned dictionary asset.

In the reference the dictionary is a compile-time artifact: MeCab IPADIC
extended with NEologd entries, compiled into Kuromoji FST/cost-matrix
resources and shaded into the jar (build.sh:161-255, SURVEY.md §1.1).  Here
the equivalent asset is this module: a cost-annotated morpheme list covering
(a) the Japanese function-word core (particles, auxiliaries, common verbs
with inflected forms → base forms), (b) common content words, and (c)
NEologd-style named-entity entries — including the surface-normalization
behavior NEologd is known for (e.g. 中居正広のミになる図書館 →
中居正広の身になる図書館, README.md:28-29).

Entry tuple: ``(surface, pos, cost, base_form, norm)``
  * pos: IPADIC-style hierarchical tag joined with ``-``
  * cost: lattice word cost (lower wins; NEologd compounds are cheap so
    named entities cohere — the きゃりーぱみゅぱみゅ → 1 token behavior,
    KuromojiNEologdUDFTest.java:248-256)
  * base_form: dictionary form for inflected entries (JapaneseBaseFormFilter
    input — SURVEY.md §2.2 row 2); None → surface
  * norm: NEologd normalized output surface; None → surface

This is engine *data*, not code; swap it for a full NEologd build in
production (the loader in dictionary.py accepts any iterable of entries).
"""

E = tuple  # (surface, pos, cost, base_form, norm)

# --- particles (助詞) — low cost, they glue the lattice together ----------
_PARTICLES = [
    ("は", "助詞-係助詞"), ("も", "助詞-係助詞"), ("こそ", "助詞-係助詞"),
    ("が", "助詞-格助詞-一般"), ("を", "助詞-格助詞-一般"),
    ("に", "助詞-格助詞-一般"), ("で", "助詞-格助詞-一般"),
    ("と", "助詞-格助詞-一般"), ("へ", "助詞-格助詞-一般"),
    ("から", "助詞-格助詞-一般"), ("より", "助詞-格助詞-一般"),
    ("にて", "助詞-格助詞-一般"),
    ("という", "助詞-格助詞-連語"), ("として", "助詞-格助詞-連語"),
    ("によって", "助詞-格助詞-連語"), ("における", "助詞-格助詞-連語"),
    ("に対して", "助詞-格助詞-連語"), ("に関する", "助詞-格助詞-連語"),
    ("の", "助詞-連体化"),
    ("て", "助詞-接続助詞"), ("で", "助詞-接続助詞"),
    ("ば", "助詞-接続助詞"), ("ながら", "助詞-接続助詞"),
    ("けど", "助詞-接続助詞"), ("けれど", "助詞-接続助詞"),
    ("し", "助詞-接続助詞"), ("ても", "助詞-接続助詞"),
    ("たり", "助詞-並立助詞"), ("や", "助詞-並立助詞"),
    ("まで", "助詞-副助詞"), ("など", "助詞-副助詞"),
    ("だけ", "助詞-副助詞"), ("ほど", "助詞-副助詞"),
    ("くらい", "助詞-副助詞"), ("ぐらい", "助詞-副助詞"),
    ("には", "助詞-格助詞-一般"), ("とは", "助詞-格助詞-一般"),
    ("では", "助詞-格助詞-一般"),
    ("か", "助詞-副助詞／並立助詞／終助詞"),
    ("ね", "助詞-終助詞"), ("よ", "助詞-終助詞"), ("な", "助詞-終助詞"),
    ("ずつ", "助詞-副助詞"),
]

# --- auxiliary verbs (助動詞) --------------------------------------------
_AUX = [
    "だ", "です", "でし", "だっ", "である", "ます", "まし", "ませ",
    "た", "だろ", "でしょ", "ない", "なかっ", "ぬ", "ん", "う", "よう",
    "まい", "たい", "たく", "らしい", "れる", "られる", "せる", "させる",
    "れ", "られ", "せ", "させ", "なら",
]

# --- verbs (動詞-自立): (surface, base) — inflected forms share the base --
_VERBS = [
    ("する", "する"), ("し", "する"), ("さ", "する"), ("すれ", "する"), ("しろ", "する"),
    ("いる", "いる"), ("い", "いる"),
    ("ある", "ある"), ("あっ", "ある"), ("あり", "ある"), ("あれ", "ある"),
    ("なる", "なる"), ("なっ", "なる"), ("なり", "なる"), ("なれ", "なる"),
    ("いう", "いう"), ("いっ", "いう"), ("いい", "いう"),
    ("使う", "使う"), ("使っ", "使う"), ("使い", "使う"), ("使え", "使う"),
    ("見る", "見る"), ("見", "見る"), ("見れ", "見る"),
    ("みる", "みる"), ("み", "みる"),
    ("できる", "できる"), ("でき", "できる"),
    ("持つ", "持つ"), ("持っ", "持つ"), ("持ち", "持つ"),
    ("行く", "行く"), ("行っ", "行く"), ("行き", "行く"),
    ("来る", "来る"), ("来", "来る"),
    ("思う", "思う"), ("思っ", "思う"), ("思い", "思う"),
    ("考える", "考える"), ("考え", "考える"),
    ("作る", "作る"), ("作っ", "作る"), ("作り", "作る"),
    ("明かす", "明かす"), ("明かし", "明かす"),
    ("読む", "読む"), ("読ん", "読む"), ("読み", "読む"),
    ("書く", "書く"), ("書い", "書く"), ("書き", "書く"),
    ("分かる", "分かる"), ("分かっ", "分かる"), ("分かり", "分かる"),
    ("言う", "言う"), ("言っ", "言う"), ("言い", "言う"),
    ("出る", "出る"), ("出", "出る"),
    ("入る", "入る"), ("入っ", "入る"), ("入り", "入る"),
    ("知る", "知る"), ("知っ", "知る"), ("知り", "知る"),
    ("呼ぶ", "呼ぶ"), ("呼ん", "呼ぶ"), ("呼ば", "呼ぶ"),
    ("試す", "試す"), ("試し", "試す"),
]

# --- conjunctions (接続詞) ------------------------------------------------
_CONJ = ["そして", "しかし", "また", "なお", "および", "及び", "さらに",
         "ただし", "または", "つまり", "だから", "でも", "ところが"]

# --- common nouns ---------------------------------------------------------
_NOUNS_GENERAL = [
    "図書館", "一幕", "番組", "内容", "情報", "結果", "方法", "問題",
    "時間", "場所", "世界", "会社", "仕事", "言葉", "単語", "文章",
    "辞書", "意味", "名前", "写真", "映画", "音楽", "新聞", "雑誌",
    "記事", "本", "人", "物", "事", "日本語", "英語", "文字",
]
_NOUNS_SAHEN = [  # 名詞-サ変接続 (suru-verbs' noun stems)
    "放送", "勘違い", "指定", "解析", "処理", "検索", "出力", "入力",
    "登録", "利用", "使用", "実行", "確認", "説明", "テスト", "分析",
    "分かち書き", "形態素解析", "正規化",
]
_NOUNS_ADVERBIAL = ["過去", "今日", "明日", "昨日", "現在", "将来", "今回", "最近"]

_NOUNS_PROPER_PERSON = [
    "中居正広", "篠原信一", "きゃりーぱみゅぱみゅ", "朝青龍",
]
_NOUNS_PROPER_ORG = [
    "テレビ朝日", "日本経済新聞", "SMAP", "関西国際空港",
]
_NOUNS_PROPER_GENERAL_NORM = [
    # NEologd compound entries (surface, normalized output) — these must
    # cohere as single tokens (README.md:28-29 behavioral anchor).
    ("中居正広のミになる図書館", "中居正広の身になる図書館"),
    ("中居正広の身になる図書館", "中居正広の身になる図書館"),
    ("クロモジ", None),
    ("JapaneseAnalyzer", None),
    ("kuromoji", None),
    ("東京スカイツリー", None),
]

_NOUNS_PLACE = ["日本", "東京", "大阪", "京都", "関西", "関東", "名古屋", "福岡"]

# Components of compounds — needed so SEARCH mode can decompound and so user
# dictionaries can override segmentation (日本経済新聞 → 日本/経済/新聞,
# KuromojiNEologdUDFTest.java:280-299).
_NOUNS_COMPONENT = ["経済", "国際", "空港", "朝日", "テレビ", "スカイ", "ツリー"]

_PREFIXES = [("第", "接頭詞-数接続")]
_SUFFIXES = [
    ("系", "名詞-接尾-一般"), ("的", "名詞-接尾-形容動詞語幹"),
    ("さん", "名詞-接尾-人名"), ("氏", "名詞-接尾-人名"),
    ("日", "名詞-接尾-助数詞"), ("月", "名詞-接尾-助数詞"),
    ("年", "名詞-接尾-助数詞"), ("回", "名詞-接尾-助数詞"),
    ("個", "名詞-接尾-助数詞"), ("人", "名詞-接尾-助数詞"),
]

_ADVERBS = ["とても", "すごく", "もっと", "ちょっと", "よく", "まだ", "もう", "ずっと"]
_ADNOMINAL = ["この", "その", "あの", "どの"]  # 連体詞


def _build() -> list[tuple]:
    entries: list[tuple] = []
    for surface, pos in _PARTICLES:
        entries.append((surface, pos, 50 * max(1, len(surface)), None, None))
    for surface in _AUX:
        entries.append((surface, "助動詞", 100, None, None))
    for surface, base in _VERBS:
        entries.append((surface, "動詞-自立", 1200, base, None))
    for surface in _CONJ:
        entries.append((surface, "接続詞", 300, None, None))
    for surface in _NOUNS_GENERAL:
        entries.append((surface, "名詞-一般", 1500, None, None))
    for surface in _NOUNS_SAHEN:
        entries.append((surface, "名詞-サ変接続", 1500, None, None))
    for surface in _NOUNS_ADVERBIAL:
        entries.append((surface, "名詞-副詞可能", 1500, None, None))
    for surface in _NOUNS_PROPER_PERSON:
        entries.append((surface, "名詞-固有名詞-人名-一般", 800, None, None))
    for surface in _NOUNS_PROPER_ORG:
        entries.append((surface, "名詞-固有名詞-組織", 800, None, None))
    for surface, norm in _NOUNS_PROPER_GENERAL_NORM:
        entries.append((surface, "名詞-固有名詞-一般", 500, None, norm))
    for surface in _NOUNS_PLACE:
        entries.append((surface, "名詞-固有名詞-地域-一般", 1200, None, None))
    for surface in _NOUNS_COMPONENT:
        entries.append((surface, "名詞-一般", 1600, None, None))
    for surface, pos in _PREFIXES:
        entries.append((surface, pos, 800, None, None))
    for surface, pos in _SUFFIXES:
        entries.append((surface, pos, 900, None, None))
    for surface in _ADVERBS:
        entries.append((surface, "副詞-一般", 1000, None, None))
    for surface in _ADNOMINAL:
        entries.append((surface, "連体詞", 400, None, None))
    # NEologd-style date entries (1日..31日, 1月..12月) — why README's golden
    # keeps 10日 as a single token (README.md:29).
    for d in range(1, 32):
        entries.append((f"{d}日", "名詞-固有名詞-一般", 900, None, None))
    for m in range(1, 13):
        entries.append((f"{m}月", "名詞-固有名詞-一般", 900, None, None))
    return entries


BUILTIN_ENTRIES: list[tuple] = _build()
