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
    # 連語 rows: IPADIC genuinely lexicalizes these multi-particle/
    # particle-verb fusions (助詞,格助詞,連語 — という/として/について/
    # によって/における/に対して/に関する…), so they stay single tokens
    # for external parity.  には/とは/では are NOT IPADIC rows (MeCab
    # segments に|は, と|は, で|は) and were removed in round 7 — the
    # parity corpus (tokenizer/parity.py) measures both directions.
    ("という", "助詞-格助詞-連語"), ("として", "助詞-格助詞-連語"),
    ("によって", "助詞-格助詞-連語"), ("における", "助詞-格助詞-連語"),
    ("により", "助詞-格助詞-連語"),
    ("に対して", "助詞-格助詞-連語"), ("に関する", "助詞-格助詞-連語"),
    ("に対する", "助詞-格助詞-連語"), ("に関して", "助詞-格助詞-連語"),
    ("について", "助詞-格助詞-連語"), ("につき", "助詞-格助詞-連語"),
    ("の", "助詞-連体化"),
    ("て", "助詞-接続助詞"), ("で", "助詞-接続助詞"),
    ("ば", "助詞-接続助詞"), ("ながら", "助詞-接続助詞"),
    ("つつ", "助詞-接続助詞"),
    ("けど", "助詞-接続助詞"), ("けれど", "助詞-接続助詞"),
    # ても removed round 7 (parity corpus s231): IPADIC has no ても row —
    # なくても is なく|て|も; both components are rows here.
    ("し", "助詞-接続助詞"),
    ("たり", "助詞-並立助詞"), ("や", "助詞-並立助詞"),
    ("まで", "助詞-副助詞"), ("など", "助詞-副助詞"),
    ("だけ", "助詞-副助詞"), ("ほど", "助詞-副助詞"),
    ("くらい", "助詞-副助詞"), ("ぐらい", "助詞-副助詞"),
    ("か", "助詞-副助詞／並立助詞／終助詞"),
    ("ね", "助詞-終助詞"), ("よ", "助詞-終助詞"), ("な", "助詞-終助詞"),
    # かな — genuine IPADIC 終助詞 row (いい+かな), and the cover that
    # makes the (PARTICLE, PARTICLE_NA) block safe: か+な no longer needs
    # the bare-な path.
    ("かな", "助詞-終助詞"),
    # かも — IPADIC 副助詞 (降る+かも+しれ+ない); absent until round 7.
    ("かも", "助詞-副助詞"),
    # とも — IPADIC 副助詞 (今後とも, 少なくとも's tail): parity corpus
    # s225; genuine と+も sequences (友達とも話した) survive on cost ties
    # where both are 100 — probe-checked.
    ("とも", "助詞-副助詞"),
    ("ずつ", "助詞-副助詞"),
    # のに/ので — genuine IPADIC 接続助詞 rows (安い+のに, 遅れた+ので);
    # absent until the round-7 parity corpus measured の+に / の+で
    # splits against MeCab.  They attach only to 用言/助動詞 — the
    # PARTICLE_CONJ_V left class BLOCKs them after nouns/particles/BOS so
    # の+におい (車のにおい) and genitive の+に keep winning there.
    ("のに", "助詞-接続助詞"), ("ので", "助詞-接続助詞"),
    # Quotative/topic って (IPADIC 助詞,格助詞,連語) — absent until the
    # wave-353 casual-register probe: やばいって shredded into
    # や+ば+言って because っ+て had no one-row alternative.
    ("って", "助詞-格助詞-連語"),
    # --- round-8 held-out tranche (ho_casual/ho_quote measured gaps) ---
    # わ (IPADIC 終助詞): terminal-form attachment via な's PARTICLE_NA
    # class (知らん+わ, 行く+わ — s518/s519); the bare 1-char row needs
    # な's discipline or it shreds hiragana words.
    ("わ", "助詞-終助詞"),
    # なあ (IPADIC 終助詞): generic particle class — unlike な it must
    # follow other 終助詞 (だ+よ+なあ, s521), which PARTICLE_NA blocks.
    ("なあ", "助詞-終助詞"),
    # じゃ (では contraction, IPADIC 副助詞) / じゃん (終助詞):
    # PARTICLE_JA left class — 体言/連体形/助動詞 contexts only
    # (いい+ん+じゃ+ない s517, できる+じゃ+ない+か s499, 言ってない+
    # じゃん s508).
    ("じゃ", "助詞-副助詞"),
    ("じゃん", "助詞-終助詞"),
    # だって (IPADIC 副助詞: 体言+だって — 子供だって, なるん+だって
    # s509).  At the 50·len formula (150) it beats だ+って (200) in its
    # contexts and loses to them nowhere (だっ+て is closed by AUX_DATT).
    ("だって", "助詞-副助詞"),
    # --- round-8 tranche 2 (ho2_* measured gaps) ---
    # でも (IPADIC 副助詞: 誰に+でも s557, 子供でも, PARTICLE_DEMO
    # class) moved to _PARTICLES_COSTED in tranche 5 — the 50·len
    # formula (100) exactly TIED で(50)+も(50) after bare nouns and the
    # tie-break shredded 誰でも (s839).
    # だり — たり's voiced twin (IPADIC 並立助詞: やん+だり s565);
    # AUX_DA-left class via the entry_classes surface scope.
    ("だり", "助詞-並立助詞"),
]

# Particles whose IPADIC cost band is NOT the 50·len formula: しか must
# sit above しかし−50 so the 接続詞 keeps its row (しか+し at 400+50
# loses to しかし 300 ✓) while still beating the し+か shred once
# (PARTICLE_SHI → PARTICLE) carries its +500 (ho_num s432/s454).
_PARTICLES_COSTED = [
    ("しか", "助詞-副助詞", 400),
    # Round-8 tranche-2 連語/接続助詞 rows (all genuine IPADIC rows the
    # ho2_part register measured missing).  Each at its measured shadow
    # minus 50 — as expensive as possible while still winning its own
    # surface, so the theft radius into genuine compositional readings
    # (手に+とっ+て, と+とも+に) is minimal:
    ("にとって", "助詞-格助詞-連語", 1250),   # に+とっ(取る)+て = 1300
    ("にあたって", "助詞-格助詞-連語", 1250),  # に+あたっ(当たる)+て = 1300
    ("とともに", "助詞-格助詞-連語", 150),     # と+とも(副助詞)+に = 200
    ("にもかかわらず", "助詞-接続助詞", 850),  # に+も+かかわら+ず = 900
    # Round-8 tranche-3 連語 rows (ho3_rengo measured the six missing
    # members of the family whose siblings already ship above: により/
    # によって/における had rows, による/において did not).  Same
    # shadow−50 pricing: the compositional reading is に/を(50) + verb
    # conjugate (1200) [+ て(50)], so each row sits just under its own
    # shadow and steals nothing shorter.  にかけて deliberately absorbs
    # 気にかけて-style idioms too — IPADIC's single row makes the same
    # call; the corpus pins only the range sense (s637).
    ("による", "助詞-格助詞-連語", 1200),     # に+よる(因る) = 1250
    # Round-9 tranche-8 連語 row (ho8_leg s1010): をもって is in
    # IPADIC's 連語 set with the family above; same shadow−50 pricing.
    ("をもって", "助詞-格助詞-連語", 1250),   # を+もっ(持つ)+て = 1300
    ("において", "助詞-格助詞-連語", 1250),   # に+おい(置く)+て = 1300
    # The three whose compositional verb is ICHIDAN sit 300 lower: the
    # 一段連用形+て path carries a −300 connection reward the 音便+て
    # shadows of にとって/にわたって don't get, so shadow−50 measured IN
    # CONTEXT (tools/explain_path.py) is 950, not 1250 (s620/s637).
    ("を通じて", "助詞-格助詞-連語", 950),    # を+通じ(通じる)+て = 1000 eff
    ("につれて", "助詞-格助詞-連語", 950),    # に+つれ(連れる)+て — つれ has
                                              # no row today, but the 一段
                                              # shadow applies the day one
                                              # lands; priced with its family
    ("にわたって", "助詞-格助詞-連語", 1250),  # に+わたっ(渡る 音便)+て = 1300
    ("にかけて", "助詞-格助詞-連語", 950),    # に+かけ(掛ける)+て = 1000 eff
    # Tranche-5 sentence-final rows (ho5_tag measured missing):
    ("かしら", "助詞-終助詞", 150),   # か+し+ら had no one-row rival
    ("ってば", "助詞-副助詞", 100),   # って(100)+ば would tie at 150
    # ものの (IPADIC 接続助詞, tranche 6): priced under its own
    # もの(90)+の(50) shadow; the PARTICLE_CONJ_V left class (entry
    # scope with のに/ので) keeps the genitive もの+の reading winning
    # everywhere the 接続助詞 is illicit (ものの値段).
    ("ものの", "助詞-接続助詞", 100),
    # でも repriced 100 → 95 (tranche 5, s839): after a bare noun the
    # compositional で(50)+も(50) TIED the row and won the tie —
    # 誰でも read 誰+で+も while 誰にでも (s557) worked only because
    # 格助詞+で is penalized.  95 = as expensive as possible while
    # winning; the te-form 飲ん+で+も stays safe structurally
    # (PARTICLE_DEMO never attaches there).
    ("でも", "助詞-副助詞", 95),
]

# --- auxiliary verbs (助動詞) --------------------------------------------
_AUX = [
    # である removed round 7 (parity corpus s217): IPADIC splits で|ある
    # (だ's 連用形 で + ある) — the boundary parses identically through
    # the existing で/ある rows.
    "だ", "です", "でし", "だっ", "ます", "まし", "ませ", "ましょ",
    "た", "だろ", "でしょ", "ない", "なかっ", "なく", "ぬ", "ず", "ざる", "ん", "う", "よう",
    # た/だ の仮定形 (IPADIC 特殊・タ/特殊・ダ rows): 行っ+たら, 飲ん+だら,
    # ござい+まし+たら.  Absent until the round-7 parity corpus — without
    # たら the lattice shredded ましたらお into まし+た+らお (unknown run).
    "たら", "だら",
    # だ's 体言接続 な (IPADIC 特殊・ダ): 雨+な+ので.  Surface-scoped to
    # AUX_COP attachment (legal after 体言 only) so the cheaper 終助詞 な
    # keeps every other context (行く+な, きれい+な via cost 50 vs 100).
    "な",
    # ない's 仮定形 (行かなければ) — absent until the wave-353 probe found
    # なければ shredding into な+ける+ば; ない-family left class.
    "なけれ",
    # なきゃ — なければ's colloquial contraction (round-8 held-out
    # tranche s506: やら+なきゃ+いけ+ない); ない-family left class via
    # the entry_classes surface scope.
    "なきゃ",
    "まい", "たい", "たく", "たかっ", "らしい", "れる", "られる", "せる", "させる",
    "れ", "られ", "せ", "させ", "なら",
    # Polite copula stem (IPADIC: ございます = 助動詞 ござい + 助動詞 ます,
    # both dropped by the POS stop filter — round-5 prose diagnostics).
    # The fused ございませ/ございまし rows were removed in round 7: MeCab
    # segments ござい|まし|た (parity corpus s64), and the ござい+まし/ませ
    # component paths already win once the fused rows stop shadowing them.
    "ござい",
    # べし連体形 (すべき/言うべき) — 助動詞 in IPADIC, dropped.
    "べき", "べし",
    # べし未然形 べから (恐れる+べから+ず — tranche 4 s695): same left
    # sites as べき, but its RIGHT side must accept ず, so entry_classes
    # gives it AUX_VSTEM (the 知られ+ず pattern).
    "べから",
    # らしい's 連用 inflections (tranche 6: いるらしく fused as an
    # unknown run; プロらしかった read ら+しかっ): same generic 助動詞
    # class as らしい itself.
    "らしく", "らしかっ",
]

# --- adjectives (形容詞-自立): (surface, base) — inflections share base ---
# JapaneseBaseFormFilter folds these to dictionary form (SURVEY.md §2.2 row 2:
# 明かし→明かす is the verb anchor; adjectives get the same treatment in
# Lucene's filter, e.g. 高かっ→高い).
_ADJECTIVES = [
    ("高い", "高い"), ("高く", "高い"), ("高かっ", "高い"), ("高けれ", "高い"),
    ("安い", "安い"), ("安く", "安い"), ("安かっ", "安い"),
    ("新しい", "新しい"), ("新しく", "新しい"), ("新しかっ", "新しい"),
    ("古い", "古い"), ("古く", "古い"), ("古かっ", "古い"),
    ("良い", "良い"), ("良く", "良い"), ("良かっ", "良い"),
    ("よい", "よい"), ("よかっ", "よい"),
    # いい (good, 形容詞 基本形-only in IPADIC — inflections go through
    # よい): absent until round 7 because the hand lexicon's いい was only
    # 言う's 連用形, which is VERB_CONT — the PARTICLE_NA block then sent
    # いいな onto an unknown run (parity-corpus probe).
    ("いい", "いい"),
    ("悪い", "悪い"), ("悪く", "悪い"), ("悪かっ", "悪い"),
    ("多い", "多い"), ("多く", "多い"), ("多かっ", "多い"),
    ("少ない", "少ない"), ("少なく", "少ない"), ("少なかっ", "少ない"),
    ("大きい", "大きい"), ("大きく", "大きい"), ("大きかっ", "大きい"),
    ("小さい", "小さい"), ("小さく", "小さい"), ("小さかっ", "小さい"),
    ("長い", "長い"), ("長く", "長い"), ("長かっ", "長い"),
    ("短い", "短い"), ("短く", "短い"), ("短かっ", "短い"),
    ("早い", "早い"), ("早く", "早い"), ("早かっ", "早い"),
    ("速い", "速い"), ("速く", "速い"),
    ("遅い", "遅い"), ("遅く", "遅い"),
    ("強い", "強い"), ("強く", "強い"), ("強かっ", "強い"),
    ("弱い", "弱い"), ("弱く", "弱い"),
    ("面白い", "面白い"), ("面白く", "面白い"), ("面白かっ", "面白い"),
    ("難しい", "難しい"), ("難しく", "難しい"), ("難しかっ", "難しい"),
    ("易しい", "易しい"), ("優しい", "優しい"), ("美しい", "美しい"),
    ("楽しい", "楽しい"), ("楽しく", "楽しい"), ("楽しかっ", "楽しい"),
    ("嬉しい", "嬉しい"), ("悲しい", "悲しい"), ("寂しい", "寂しい"),
    ("忙しい", "忙しい"), ("忙しく", "忙しい"),
    ("暑い", "暑い"), ("寒い", "寒い"), ("暖かい", "暖かい"),
    ("広い", "広い"), ("広く", "広い"), ("狭い", "狭い"),
    ("近い", "近い"), ("近く", "近い"), ("遠い", "遠い"), ("遠く", "遠い"),
    ("深い", "深い"), ("深く", "深い"), ("浅い", "浅い"),
    ("重い", "重い"), ("重く", "重い"), ("軽い", "軽い"), ("軽く", "軽い"),
    ("正しい", "正しい"), ("正しく", "正しい"),
    ("詳しい", "詳しい"), ("詳しく", "詳しい"),
    ("欲しい", "欲しい"), ("欲しく", "欲しい"),
]

# --- adjectival-noun stems (名詞-形容動詞語幹) -----------------------------
_ADJ_NOUN_STEMS = [
    "簡単", "便利", "必要", "重要", "有名", "特別", "自由", "安全",
    "可能", "大変", "元気", "綺麗", "静か", "豊か", "確か", "十分",
    "複雑", "正確", "適切", "有効", "明確", "具体的", "基本的",
    # audit 160 (round 12): the SINGLE-KANJI 形容動詞語幹 members
    # (IPADIC 嫌 イヤ, 変 ヘン, 楽 ラク, 急 キュウ, 妙 ミョウ) had no
    # rows at all, so 嫌なやつ grouped な into the following kana run
    # (嫌|なやつ) instead of reading the copula-な attachment the
    # NOUN_KD class exists for — the audit-158b sweep scanned only rows
    # ALREADY before な in the corpora, which is why rowless stems
    # survived it.  Neighbor compounds all carry fused rows at 1500
    # (機嫌/嫌味/大嫌い/変化/変更/大変/音楽/気楽/微妙/奇妙/急行/特急),
    # so the new 1-kanji rows only ever beat unknown alternatives.
    "嫌", "変", "楽", "急", "妙",
]

# --- verbs (動詞-自立): (surface, base) — inflected forms share the base --
_VERBS = [
    ("する", "する"), ("し", "する"), ("さ", "する"), ("すれ", "する"), ("しろ", "する"),
    # サ変/カ変 未然ウ接続 rows (勉強しよ+う, 早く来よ+う) — IPADIC
    # lexicalizes the volitional site; classes via _IRREGULAR_MIZEN_U.
    ("しよ", "する"), ("来よ", "来る"),
    # サ変 未然形 せ (IPADIC する paradigm): 失敗せ+ぬ, 勉強せ+ず —
    # absent until the round-8 tranche 3 (s649 read 失敗+せぬよう as an
    # unknown run).  _IRREGULAR_MIZEN (connection.py) already names the
    # ("せ", "する") pair, so the row lands in the hard-constrained
    # 未然形 class the causative-せ 助動詞 row cannot reach from nouns.
    ("せ", "する"),
    ("いる", "いる"), ("い", "いる"),
    # Colloquial ている-contraction てる (IPADIC 動詞,非自立,一段):
    # 言ってる = 言っ+てる — the る otherwise strands as an unknown run
    # (wave-353 casual-register probe).  でる (飲んでる) already resolves
    # through the hiragana 出る row — same segmentation, so no twin row.
    ("てる", "てる"),
    # カ変 連用形 き (base くる) — MeCab reads してきた as し|て|き|た and
    # 持ってくる-family aux chains through き (parity corpus s104).  Absent
    # until round 7 (single-char カ変 stems were length-filtered from the
    # generator); the fused きた/きます rows remain for bare contexts, but
    # き+た (100-cost aux + −800 連用 reward) now wins wherever MeCab
    # splits.  きたない stays whole via the (AUX_TA_R, AUX_NAI) BLOCK.
    ("き", "くる"),
    # カ変 命令形 来い (IPADIC ro-imperative row): 「早く来い」と — the
    # round-8 held-out tranche (ho_quote s486) measured 来+い(いる)
    # winning without it.  Classed 未然形-like via _IRREGULAR_CONJ
    # (connection.py): nothing auxiliary may follow a 命令形.
    ("来い", "来る"),
    # てる's 連用形 て (IPADIC 動詞,非自立,一段 てる paradigm): the
    # contracted-progressive past/negative chains attach here — 見+て+た,
    # し+て+た+の (s515/s525), 言っ+て+ない (s508).  The 接続助詞 て row
    # keeps every ordinary te-form (50 vs 1200); this row only wins when
    # its VERB_CONT right side unlocks an auxiliary the particle cannot
    # take.
    ("て", "てる"),
    ("ある", "ある"), ("あっ", "ある"), ("あり", "ある"), ("あれ", "ある"),
    # ある's 未然ウ接続 あろ (であろう — tranche 4 s694 measured
    # であろう fusing as an unknown run): classes via _IRREGULAR_MIZEN_U,
    # same as 行こ/しよ/来よ.
    ("あろ", "ある"),
    ("なる", "なる"), ("なっ", "なる"), ("なり", "なる"), ("なれ", "なる"),
    ("いう", "いう"),
    # いっ/いい (言う's 音便/連用形 in kana) moved to the costed 1500 tier
    # in _build() (audit 170): at the flat 1200 they tied — and, as the
    # earlier-registered rows, beat — いっ(いく)'s 促音便 row and the いい
    # 形容詞, which is IPADIC's preference inverted (ipadic-2.7.0 prices
    # 行く's いっ below 言う's, and いい adjectival contexts below the
    # 連用形).  At 1500 the 言う rows still win exactly where ます/まし
    # must follow a 連用形 (と+いい+ます keeps its -800 連用形→助動詞
    # reward; the 形容詞 cannot take ます), which is the IPADIC split.
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
    ("食べる", "食べる"), ("食べ", "食べる"),
    ("飲む", "飲む"), ("飲ん", "飲む"), ("飲み", "飲む"),
    ("買う", "買う"), ("買っ", "買う"), ("買い", "買う"), ("買え", "買える"), ("買える", "買える"),
    ("売る", "売る"), ("売っ", "売る"), ("売り", "売る"),
    ("聞く", "聞く"), ("聞い", "聞く"), ("聞き", "聞く"),
    ("話す", "話す"), ("話し", "話す"),
    ("歩く", "歩く"), ("歩い", "歩く"),
    ("走る", "走る"), ("走っ", "走る"),
    ("待つ", "待つ"), ("待っ", "待つ"), ("待ち", "待つ"),
    ("会う", "会う"), ("会っ", "会う"), ("会い", "会う"),
    ("住む", "住む"), ("住ん", "住む"),
    ("遊ぶ", "遊ぶ"), ("遊ん", "遊ぶ"),
    ("始める", "始める"), ("始め", "始める"),
    ("始まる", "始まる"), ("始まっ", "始まる"), ("始まり", "始まる"),
    ("終わる", "終わる"), ("終わっ", "終わる"), ("終わり", "終わる"),
    ("続く", "続く"), ("続い", "続く"), ("続き", "続く"),
    ("続ける", "続ける"), ("続け", "続ける"),
    ("変わる", "変わる"), ("変わっ", "変わる"), ("変わり", "変わる"),
    ("変える", "変える"), ("変え", "変える"),
    ("選ぶ", "選ぶ"), ("選ん", "選ぶ"), ("選び", "選ぶ"),
    ("調べる", "調べる"), ("調べ", "調べる"),
    ("覚える", "覚える"), ("覚え", "覚える"),
    ("忘れる", "忘れる"), ("忘れ", "忘れる"),
    ("教える", "教える"), ("教え", "教える"),
    ("学ぶ", "学ぶ"), ("学ん", "学ぶ"), ("学び", "学ぶ"),
    ("働く", "働く"), ("働い", "働く"), ("働き", "働く"),
    ("探す", "探す"), ("探し", "探す"),
    ("見つける", "見つける"), ("見つけ", "見つける"),
    ("決める", "決める"), ("決め", "決める"),
    ("開く", "開く"), ("開い", "開く"), ("開き", "開く"),
    ("閉じる", "閉じる"), ("閉じ", "閉じる"),
    ("付ける", "付ける"), ("付け", "付ける"),
    ("取る", "取る"), ("取っ", "取る"), ("取り", "取る"),
    ("置く", "置く"), ("置い", "置く"), ("置き", "置く"),
    ("運ぶ", "運ぶ"), ("運ん", "運ぶ"),
    ("渡す", "渡す"), ("渡し", "渡す"),
    ("返す", "返す"), ("返し", "返す"),
    ("示す", "示す"), ("示し", "示す"),
    ("表す", "表す"), ("表し", "表す"),
    ("含む", "含む"), ("含ん", "含む"), ("含ま", "含む"), ("含み", "含む"),
    ("得る", "得る"), ("得", "得る"),
    ("与える", "与える"), ("与え", "与える"),
    ("加える", "加える"), ("加え", "加える"),
    ("求める", "求める"), ("求め", "求める"),
    ("用いる", "用いる"), ("用い", "用いる"),
    ("行う", "行う"), ("行っ", "行う"), ("行い", "行う"), ("行わ", "行う"),
    ("受ける", "受ける"), ("受け", "受ける"),
    ("送る", "送る"), ("送っ", "送る"), ("送り", "送る"),
    ("立つ", "立つ"), ("立っ", "立つ"), ("立ち", "立つ"),
    ("座る", "座る"), ("座っ", "座る"),
    ("死ぬ", "死ぬ"), ("死ん", "死ぬ"),
    ("泳ぐ", "泳ぐ"), ("泳い", "泳ぐ"),
    ("答える", "答える"), ("答え", "答える"),
    ("呼べる", "呼べる"),
    ("進む", "進む"), ("進ん", "進む"), ("進め", "進める"), ("進める", "進める"),
    ("残る", "残る"), ("残っ", "残る"), ("残り", "残る"), ("残す", "残す"),
    ("戻る", "戻る"), ("戻っ", "戻る"), ("戻す", "戻す"),
    ("集める", "集める"), ("集め", "集める"), ("集まる", "集まる"), ("集まっ", "集まる"),
    ("並ぶ", "並ぶ"), ("並ん", "並ぶ"), ("並べる", "並べる"), ("並べ", "並べる"),
    ("数える", "数える"), ("数え", "数える"),
    ("測る", "測る"), ("測っ", "測る"),
    ("比べる", "比べる"), ("比べ", "比べる"),
    ("分ける", "分ける"), ("分け", "分ける"),
    ("並び替える", "並び替える"),
]

# --- conjunctions (接続詞) ------------------------------------------------
_CONJ = ["そして", "しかし", "また", "なお", "および", "及び", "さらに",
         "ただし", "または", "つまり", "だから", "でも", "ところが",
         # しかも moved here from a generator cost override (wave-390
         # shadow re-audit): at the 300 接続詞 tier it clears しか(400)+
         # も, which the generator's 1000 tier would not.
         "しかも",
         # Tranche-4 connectives (ho4_conj measured missing): at the 300
         # tier しかしながら clears しかし(300)+ながら(50) by 50;
         # それゆえ/ならびに clear their unknown-run shadows outright.
         "しかしながら", "それゆえ", "ならびに",
         # Tranche-5 connectives (ho5_fill measured missing): さて read
         # さ(サ変未然)+て, ところで read ところ(400)+で, それで read
         # それ+で.  それで/ところで deliberately absorb the genuine
         # pronoun+で / place-noun+で readings too — IPADIC's single
         # rows force the same call, and the corpus adjudicates the one
         # ambiguous pinned case by rewording (s823 これで).
         "さて", "ところで", "それで",
         # それでは/それでも (IPADIC 接続詞 rows): at 300 they clear
         # それで(300)+は/も(50) by 50 — the isolation audit surfaced
         # the split the moment それで landed.
         "それでは", "それでも"]

# --- common nouns ---------------------------------------------------------
_NOUNS_GENERAL = [
    "図書館", "一幕", "番組", "内容", "情報", "結果", "方法", "問題",
    "時間", "場所", "世界", "会社", "仕事", "言葉", "単語", "文章",
    "辞書", "意味", "名前", "写真", "映画", "音楽", "新聞", "雑誌",
    "記事", "本", "人", "物", "事", "日本語", "英語", "文字",
    "学校", "大学", "先生", "学生", "子供", "家族", "友達", "社会",
    "国", "町", "店", "家", "部屋", "道", "駅", "電車", "車", "自転車",
    "手", "目", "頭", "心", "声", "顔", "体", "気", "力", "夢",
    "朝", "昼", "夜", "春", "夏", "秋", "冬", "天気", "雨", "雪",
    "山", "川", "海", "空", "花", "木", "犬", "猫", "鳥", "魚",
    "料理", "食事", "水", "お金", "値段", "価格", "商品", "製品",
    "技術", "研究", "開発", "設計", "機能", "性能", "品質", "環境",
    "関係", "状態", "状況", "条件", "理由", "目的", "対象", "範囲",
    "結論", "原因", "効果", "特徴", "種類", "部分", "全体",
    # 影響 moved to _NOUNS_SAHEN (wave-430 subtype sweep: IPADIC
    # 名詞,サ変接続 — connection classes identical, POS string only).
    "最初", "最後", "順番", "番号", "数", "量", "形", "色",
    # 途中 moved to _NOUNS_ADVERBIAL (wave-431 副詞可能 subtype sweep).
    "音", "味", "匂い", "気持ち", "感じ", "経験", "知識", "能力",
]
# --- single-kanji noun tier (round-8 audit 129) ---------------------------
# The generator bans 1-char surfaces (its unknown-word rationale), so the
# genuine IPADIC single-kanji noun rows live here.  A systematic presence
# scan found 133/155 everyday single-kanji nouns missing: each bare 壁/窓/
# 靴 in text paid the 5200 unk-kanji1 cost and risked 円台-style merges
# with its neighbor.  At the 1500 noun tier these rows never outbid any
# multi-char dictionary compound (1500+1500 > any one-row 1500), so dict
# compounds are structurally safe; compounds that previously round-tripped
# through ACCIDENTAL unknown fusion now split unless lexicalized — wave
# 395 adds the IPADIC-genuine compound tier alongside (森林, 前後, 田畑…),
# which is exactly MeCab's behavior (real IPADIC carries both layers).
_NOUNS_SINGLE_KANJI_POSITIONAL = [
    # IPADIC 名詞,非自立,副詞可能 (机の上, 駅の前 — not stop-dropped by
    # the default stoptag set, which strips particles/aux only):
    "上", "下", "中", "外", "内", "前", "後",
]
_NOUNS_SINGLE_KANJI = [
    "横", "隣", "奥", "隅", "角", "縁", "壁", "床", "窓", "扉", "戸",
    "柱", "棚", "机", "皿", "箸", "袋", "箱", "紙", "布", "糸", "針",
    "釘", "鍵", "棒", "板", "石", "砂", "泥", "灰", "煙", "炎", "氷",
    "星", "島", "湖", "池", "沼", "谷", "森", "林", "畑", "田", "庭",
    "船", "馬", "牛", "豚", "鶏", "虫", "米", "麦", "豆", "芋", "肉",
    "皮", "汗", "涙", "香", "恋", "愛", "首", "肩", "腕", "足", "腰",
    "胸", "腹", "背", "口", "耳", "鼻", "歯", "舌", "唇", "爪", "髪",
    "膝", "肘", "指", "咳", "熱", "汁", "粉", "塩", "酢", "油", "蜜",
    "餅", "粥", "飯", "茶", "酒", "巣", "穴", "網", "罠", "籠", "綱",
    "縄", "輪", "鈴", "笛", "鐘", "旗", "傘", "靴", "服", "帯", "袖",
    "襟", "裾", "糊", "墨", "筆", "硯", "幕", "柵", "堀", "門", "塔",
    "蔵", "倉", "塀", "麓", "岬", "蓋", "鍋", "峠", "裏",
    # audit 161 (round 12): the kanji row of やつ (IPADIC 名詞,一般 —
    # the gen tool drops single-char surfaces, so it lives here); the
    # ho11_ra probe read 奴らの as 奴+らの before the SUFFIX_RA class
    # could attach (an unknown 奴's right class is not NOUN).
    "奴",
    # audit 163 (round 12): 男/女 (IPADIC 名詞,一般 オトコ/オンナ) —
    # deferred from audit 161 until their rowless compound neighborhood
    # landed (wave 436: 男子/女子/美女/女王/女神/男前/海女/大男/山男 +
    # 20 more), because the 1-kanji rows split those wholesale the
    # moment they existed (the wave-434 hazard).  With the neighborhood
    # waved, the rows close 男らが → 男|ら|が (ho13_gender).
    "男", "女",
    # Standalone-noun twins of audit-135's counter suffixes (話を聞く,
    # 曲が流れる, 席を立つ…) — the 助数詞 rows alone would carry the
    # wrong POS in free-noun contexts:
    "話", "曲", "種", "席", "票",
    "丘",  # audit-136 geography scan
    # audit-146 flora/metal singles (multi-kanji compounds like 松本/
    # 佐藤 keep their own rows, which always outprice splits):
    "桜", "梅", "松", "竹", "杉", "檜", "欅", "椿", "菊", "藤", "蘭",
    "稲", "粟", "稗", "綿", "銅", "金", "銀", "鉛",
    # audit-147 fauna/weather singles (37/40 fauna kanji were missing):
    "鶴", "亀", "鷹", "鷲", "鳩", "雀", "燕", "烏", "鴨", "雉",
    "鯉", "鮭", "鮪", "鯛", "鰯", "鯖", "鰻", "蟹", "蛸", "貝",
    "蜂", "蟻", "蝶", "蛾", "蚊", "蝿", "蝉", "熊", "鹿", "猪",
    "狐", "狸", "兎", "鼠", "蛇", "蛙", "虹", "雷", "霧", "霞",
    "露",
    # deliberately excluded: 匂 (only 匂い is a standalone word — its row
    # ships as a deverbal noun), 庫 (suffix-only, never free-standing).
]

_NOUNS_SAHEN = [  # 名詞-サ変接続 (suru-verbs' noun stems)
    "放送", "勘違い", "指定", "引数", "解析", "処理", "検索", "出力", "入力",
    "登録", "利用", "使用", "実行", "確認", "説明", "テスト", "分析",
    "分かち書き", "形態素解析", "正規化",
    "勉強", "旅行", "買い物", "電話", "連絡", "相談", "質問",
    "回答", "報告", "発表", "紹介", "案内", "予約", "注文", "購入",
    "販売", "提供", "作成", "生成", "変換", "変更", "更新", "削除",
    "追加", "保存", "計算", "集計", "比較", "評価", "判断", "選択",
    "決定", "管理", "運用", "対応", "参加", "協力", "準備", "完成",
    "成功", "失敗", "開始", "終了", "移動", "到着", "出発", "帰宅",
    # wave-430 subtype sweep arrivals (IPADIC 名詞,サ変接続; formerly in
    # the general tiers above — segmentation-neutral, POS output only):
    "影響", "計画", "議論",
]
_NOUNS_ADVERBIAL = ["過去", "今日", "明日", "昨日", "現在", "将来", "今回", "最近",
                    "今年", "去年", "来年", "毎日", "毎年", "毎回", "以前", "以降",
                    "以上", "以下", "全部", "一部", "今後", "当時", "午前", "午後",
                    # wave-431 副詞可能 subtype sweep arrival (IPADIC
                    # fact; formerly in the general tier above):
                    "途中"]

# --- pronouns (名詞-代名詞-一般) ------------------------------------------
_PRONOUNS = ["これ", "それ", "あれ", "どれ", "ここ", "そこ", "あそこ", "どこ",
             "私", "僕", "君", "彼", "彼女", "誰", "何", "みんな", "我々",
             "あなた", "自分",
             # audit 160 (round 12): the つ-family demonstrative pronouns
             # (IPADIC 名詞,代名詞,一般) — probe-confirmed shreds in
             # RUNNING text: sentence-final they grouped whole, but a
             # following particle extends the kana run and the grouped
             # candidate swallowed it (あいつは強い → あいつは|強い,
             # こいつを見ろ → こいつを|…), and やつが来た read や+つが.
             # どいつ is hiragana — no collision with ドイツ (katakana
             # surface, different codepoints).
             "あいつ", "こいつ", "そいつ", "どいつ",
             # audit 161 (round 12): 彼ら is a LEXICALIZED IPADIC
             # pronoun row (カレラ) — it must stay whole under the new
             # SUFFIX_RA class (彼ら 1200 vs 彼 1200 + ら 900 = 2100;
             # held-out pin s1117); お前 (オマエ) read お|前 through the
             # 接頭詞 お; ここら (ココラ) grouped with its particle
             # (ここらで one token).  こちら/そちら/あちら/どちら and
             # 傍ら/平ら already ship as snapshot rows.
             "彼ら", "お前", "ここら",
             # audit 161 collision sweep: これら/それら are LEXICALIZED
             # IPADIC pronoun rows — without them the new NOUN→SUFFIX_RA
             # reward re-split them as これ+ら/それ+ら (pre-sweep they
             # grouped as unknowns, same surface, so the six axes never
             # saw them); 俺 (オレ) read 俺+らの with ら fused into the
             # particle.  あれら is NOT added — IPADIC membership
             # uncertain, and a wrong row would create a divergence.
             "これら", "それら", "俺"]

# --- katakana loanwords (名詞-一般) ---------------------------------------
# Dictionary entries split adjacent katakana compounds at word boundaries
# (データベースサービス → データベース/サービス) where unknown-word grouping
# would fuse the whole run — the same reason Kuromoji carries loanwords in
# IPADIC.  Keep these NON-ASCII only: pure-ASCII surfaces would gate the
# analyzer's ASCII fast path (analyzer.py) per line containing them.
_NOUNS_KATAKANA = [
    "データ", "データベース", "システム", "サービス", "インターネット",
    "コンピュータ", "コンピューター", "ソフトウェア", "ハードウェア",
    "アプリ", "アプリケーション", "ウェブ", "サイト", "ページ",
    "ユーザー", "ユーザ", "ファイル", "フォルダ", "ネットワーク",
    "サーバー", "サーバ", "クラウド", "プログラム", "プログラミング",
    "デザイン", "プロジェクト", "チーム", "ゲーム", "ニュース",
    # audit 162 (round 12): プロ (IPADIC 名詞,一般) had no row, so its
    # unknown-katakana right class never reached the SUFFIX_RA reward
    # (プロらしさ grouped らしさを).  Longer committed rows keep winning
    # their own surfaces (プログラム/プロジェクト at 1500 whole vs
    # プロ+tail ≥ 3000), and rowless プロX katakana runs keep grouping
    # (プロ 1500 + unknown tail > the grouped unknown).
    "プロ",
    "ブログ", "メール", "スマホ", "スマートフォン", "パソコン",
    "ネット", "ライブラリ", "フレームワーク", "モデル", "テーブル",
    "カラム", "インデックス", "クエリ", "バッチ", "ストリーム",
    "メモリ", "ディスク", "キャッシュ", "ログ", "エラー", "バグ",
    "テキスト", "イメージ", "ビデオ", "オーディオ", "トークン",
    "ベクトル", "クラスタ", "クラスター", "ノード", "グラフ",
    "ランキング", "レポート", "レビュー", "コメント", "メッセージ",
    "イベント", "セッション", "ストア", "ショップ", "ホテル",
    "レストラン", "メニュー", "コーヒー", "ビール", "ワイン",
    "バス", "タクシー", "ホーム", "ビル", "マンション",
]

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
    # NEologd-style neologism coverage: era names, tech/ML compounds, web
    # culture — entries whose whole point is cohering as one token where
    # plain IPADIC would shred them (the きゃりーぱみゅぱみゅ property,
    # KuromojiNEologdUDFTest.java:248-256).  Surface variants normalize to a
    # canonical form like NEologd's seed CSV does.
    ("令和", None), ("平成", None), ("昭和", None),
    ("機械学習", None), ("人工知能", None), ("深層学習", None),
    ("ディープラーニング", None),
    ("自然言語処理", None), ("形態素解析器", None),
    ("ビッグデータ", None), ("データサイエンス", None),
    ("クラウドコンピューティング", None),
    ("ブロックチェーン", None), ("仮想通貨", None),
    ("ポケモンGO", "ポケモンGO"),
    ("インスタ映え", None), ("インスタグラム", None),
    ("ツイッター", None), ("ユーチューバー", None), ("ユーチューブ", None),
    ("スマートウォッチ", None), ("タピオカミルクティー", None),
    ("東京オリンピック", None), ("東京ディズニーランド", None),
    ("新型コロナウイルス", None), ("働き方改革", None),
    ("キャッシュレス決済", None), ("ふるさと納税", None),
    ("構造化ストリーミング", None), ("分散処理", None),
]

_NOUNS_PLACE = ["日本", "東京", "大阪", "京都", "関西", "関東", "名古屋", "福岡"]

# Components of compounds — needed so SEARCH mode can decompound and so user
# dictionaries can override segmentation (日本経済新聞 → 日本/経済/新聞,
# KuromojiNEologdUDFTest.java:280-299).
_NOUNS_COMPONENT = ["経済", "国際", "空港", "朝日", "テレビ", "スカイ", "ツリー"]

# お/ご added round 7: they were single-char UNKNOWN nodes before
# (correct boundaries, wrong POS — and お+かけ could never outbid
# おか+けし, the last measured keigo parity deviation); attachment is
# class-restricted, see connection.PREFIX.
_PREFIXES = [("第", "接頭詞-数接続"),
             ("お", "接頭詞-名詞接続"), ("ご", "接頭詞-名詞接続")]
_SUFFIXES = [
    # さ added round 7 (さ-nominal redesign): IPADIC's 名詞,接尾,特殊 row
    # — 美し+さ, 穏やか+さ; attachment hard-restricted to ガル接続 stems
    # and 体言 (connection.NOUN_SA).
    ("さ", "名詞-接尾-特殊"),
    # そう (appearance そうだ — IPADIC 名詞,接尾,助動詞語幹): 高+そう+な,
    # 降り+そう+だ; attachment hard-restricted, see connection.NOUN_SOU.
    ("そう", "名詞-接尾-助動詞語幹"),
    # げ (IPADIC 名詞,接尾,形容動詞語幹): うれし+げ+な, 不安+げ+に —
    # さ's attachment sites, NOUN_KD right side (wave 388).
    ("げ", "名詞-接尾-形容動詞語幹"),
    # がち (IPADIC 名詞,接尾,形容動詞語幹): ためらい+がち, 曇り+がち —
    # wave-373 audit; generic NOUN classes (its left neighbors are
    # deverbal nouns, which the dictionary carries as NOUN-class rows).
    ("がち", "名詞-接尾-形容動詞語幹"),
    ("系", "名詞-接尾-一般"), ("的", "名詞-接尾-形容動詞語幹"),
    ("さん", "名詞-接尾-人名"), ("氏", "名詞-接尾-人名"),
    ("日", "名詞-接尾-助数詞"), ("月", "名詞-接尾-助数詞"),
    ("年", "名詞-接尾-助数詞"), ("回", "名詞-接尾-助数詞"),
    ("個", "名詞-接尾-助数詞"), ("人", "名詞-接尾-助数詞"),
    # 時/半 (IPADIC 名詞,接尾,助数詞): without them adjacent single-kanji
    # unknowns MERGE — 6時半 read 6+時半 as one unk-kanji2 node because
    # 時(5200)+半(5200) > 時半(6900) (round-8 held-out tranche, s439).
    ("時", "名詞-接尾-助数詞"), ("半", "名詞-接尾-助数詞"),
    # 円/台 (IPADIC 名詞,接尾,助数詞): the same merge mode as 時/半 —
    # 3万円台 read 円+台 as one unk-kanji2 node because 円(5200)+台(5200)
    # > 円台(6900) (round-8 tranche 3, s631).  Digit+円 contexts passed
    # before only because the single-kanji unknown happened to align.
    ("円", "名詞-接尾-助数詞"), ("台", "名詞-接尾-助数詞"),
    # ごろ (IPADIC 名詞,接尾,副詞可能 — 三時ごろ, 今ごろ's tail): the
    # kana twin of 頃; tranche 6 measured its absence.
    ("ごろ", "名詞-接尾-副詞可能"),
    # 入り (IPADIC 名詞,接尾,一般 — 審議入り, 500ミリリットル入り): the
    # verb rows alone left 〜入りです unreachable for the AUX_COP です
    # (tranche 4 s755 read で+す through the 文語 す row).
    ("入り", "名詞-接尾-一般"),
    # The full IPADIC 助数詞 tier (round-8 audit 135): every one of
    # these reproduced the 円台 merge bug in digit contexts — 犬を3匹
    # 飼う read 3+匹飼+う, fusing the counter with the following verb's
    # first kanji and stranding its tail.  NOT at the vetted 900 tier:
    # these kanji open common compounds (発表, 話題, 品質…), and at 900
    # the suffix undercut them (発+表し beat 発表 by 100 on the first
    # corpus run) — digit contexts only compete with ≥6900 unknown
    # merges, so the plain 1500 noun tier wins there just the same.
]

# つ (IPADIC 名詞,接尾,助数詞 — the most common counter in the language;
# round 12, VERDICT r11 #2): the ONLY hiragana counter, so it cannot sit
# on the 900/1500 kanji tiers — a cheap 1-char hiragana row is a lattice
# thief (や+つ would undercut やつ, あい+つ would undercut あいつ).
# Priced at 3600 and rewarded -2700 from the digit runs' NUM_UNK right
# class (connection.TUPLE_OVERRIDES), so it wins after arabic numbers
# ONLY:
#   3つある  → つ 3600-2700 + ある 1200 = 2100 < つある grouped 4500
#   1つください → 900+1200 = 2100 < つく 1200 + ださい(row) 1200 = 2400
#   やつ/あいつ/こたつ stay whole (3600+penalty beats every split)
#   ひとつ/一つ/二つ/三つ/いくつ lexicalized rows win outright (1500)
#   kanji numerals carry no reward (一人/一時 fused rows keep winning).
# Probe-verified collision set recorded in BASELINE.md (round-12 entry).
_SUFFIX_COUNTER_TSU = ("つ", "名詞-接尾-助数詞", 3600)

# ら (IPADIC 名詞,接尾,一般 — the plural/collective suffix: 子供ら,
# 容疑者ら, 学生ら; ubiquitous in news text; round 12, audit 161 — the
# class the audit-160 note deferred): the same 1-char-hiragana lattice
# arithmetic as つ — a cheap row is a thief (さく+ら would undercut
# さくら, ば+ら would undercut ばら), so it sits at 3600 with a -2700
# reward from noun rights ONLY (connection.SUFFIX_RA):
#   子供らが遊ぶ → ら 3600-2700 + が 50 band < らが grouped unknown 4400+
#   やつらが来た → やつ 1200 + ら 900 beats や+つら junk
#   彼ら/これら/それら/こちら/傍ら/平ら lexicalized rows win outright
#   彼らしい → らしい's 助動詞 row (≤1200) beats ら 900 + しい (4400+)
# Probe-verified collision set recorded in BASELINE.md (audit 161).
_SUFFIX_PLURAL_RA = ("ら", "名詞-接尾-一般", 3600)

_SUFFIXES_COUNTER_1500 = [
    ("匹", "名詞-接尾-助数詞"), ("頭", "名詞-接尾-助数詞"),
    ("羽", "名詞-接尾-助数詞"), ("冊", "名詞-接尾-助数詞"),
    ("軒", "名詞-接尾-助数詞"), ("枚", "名詞-接尾-助数詞"),
    ("通", "名詞-接尾-助数詞"), ("件", "名詞-接尾-助数詞"),
    ("名", "名詞-接尾-助数詞"), ("社", "名詞-接尾-助数詞"),
    ("校", "名詞-接尾-助数詞"), ("歳", "名詞-接尾-助数詞"),
    ("点", "名詞-接尾-助数詞"), ("杯", "名詞-接尾-助数詞"),
    ("曲", "名詞-接尾-助数詞"), ("話", "名詞-接尾-助数詞"),
    ("品", "名詞-接尾-助数詞"), ("種", "名詞-接尾-助数詞"),
    ("部", "名詞-接尾-助数詞"), ("巻", "名詞-接尾-助数詞"),
    ("章", "名詞-接尾-助数詞"), ("節", "名詞-接尾-助数詞"),
    ("号", "名詞-接尾-助数詞"), ("階", "名詞-接尾-助数詞"),
    ("課", "名詞-接尾-助数詞"), ("組", "名詞-接尾-助数詞"),
    ("班", "名詞-接尾-助数詞"), ("期", "名詞-接尾-助数詞"),
    ("泊", "名詞-接尾-助数詞"), ("勝", "名詞-接尾-助数詞"),
    ("敗", "名詞-接尾-助数詞"), ("票", "名詞-接尾-助数詞"),
    ("席", "名詞-接尾-助数詞"), ("室", "名詞-接尾-助数詞"),
    ("棟", "名詞-接尾-助数詞"), ("基", "名詞-接尾-助数詞"),
    ("発", "名詞-接尾-助数詞"), ("球", "名詞-接尾-助数詞"),
    ("粒", "名詞-接尾-助数詞"), ("滴", "名詞-接尾-助数詞"),
    ("束", "名詞-接尾-助数詞"),
]

# --- fillers (フィラー) — IPADIC's hesitation tier; the default stoptag
# set drops them (Lucene stoptags.txt lists フィラー), so rows make the
# default tokenize FAITHFULLY silent on ええと/あのう instead of
# emitting them as unknown nouns (round-8 tranche 5: あのう read
# あの(連体詞)+う before the row existed).
_FILLERS = ["ええと", "えーと", "あのう", "あのー", "うーん", "まあ",
            "ええっと", "んーと"]

_ADVERBS = ["とても", "すごく", "もっと", "ちょっと", "よく", "まだ", "もう", "ずっと",
            "もちろん", "たとえば", "例えば", "実際", "本当に", "かなり",
            "非常に", "少し", "多分", "たぶん", "やはり", "やっぱり",
            "常に", "既に", "すでに", "まず", "すぐ", "いつも", "ほぼ",
            "だいたい", "なぜ", "どう", "こう", "そう", "ぜひ"]
_ADNOMINAL = ["この", "その", "あの", "どの", "いろんな", "大きな", "小さな",
              # Wave 321 presence scan: そんな was an unknown run while
              # こんな/あんな/どんな matched; こういう-family, とんだ,
              # 単なる, 大した are IPADIC 連体詞 rows.
              "そんな", "こういう", "そういう", "ああいう", "どういう",
              # おかしな (IPADIC 連体詞 — NOT おかしい's 連体形): absent
              # until round-8 tranche 3 (s674 read おか+し+な).
              "とんだ", "単なる", "大した", "ほんの", "おかしな",
              "あんな"]  # 連体詞 (あんな: tranche 6 — あ+ん+な shred)
_INTERJECTIONS = ["はい", "いいえ", "ありがとう", "こんにちは", "おはよう",
                  "こんばんは", "すみません", "なるほど"]  # 感動詞


# --- round-2 lexicon growth (VERDICT r1 "missing" #1) ----------------------
# Same categories, broader coverage; every surface is non-ASCII so the
# analyzer's ASCII fast-path gate (ascii_matchable_surfaces) is unaffected.
_VERBS_EXTRA = [
    ("帰る", "帰る"), ("帰っ", "帰る"), ("帰り", "帰る"),
    ("休む", "休む"), ("休ん", "休む"), ("休み", "休む"),
    ("寝る", "寝る"), ("寝", "寝る"),
    ("起きる", "起きる"), ("起き", "起きる"),
    ("起こる", "起こる"), ("起こっ", "起こる"), ("起こり", "起こる"),
    ("着る", "着る"), ("着", "着る"), ("着く", "着く"), ("着い", "着く"),
    ("切る", "切る"), ("切っ", "切る"), ("切り", "切る"), ("切れる", "切れる"), ("切れ", "切れる"),
    ("消す", "消す"), ("消し", "消す"), ("消える", "消える"), ("消え", "消える"),
    ("押す", "押す"), ("押し", "押す"), ("引く", "引く"), ("引い", "引く"),
    ("打つ", "打つ"), ("打っ", "打つ"), ("打ち", "打つ"),
    ("投げる", "投げる"), ("投げ", "投げる"),
    ("拾う", "拾う"), ("拾っ", "拾う"),
    ("落ちる", "落ちる"), ("落ち", "落ちる"), ("落とす", "落とす"), ("落とし", "落とす"),
    ("上がる", "上がる"), ("上がっ", "上がる"), ("上がり", "上がる"),
    ("上げる", "上げる"), ("上げ", "上げる"),
    ("下がる", "下がる"), ("下がっ", "下がる"), ("下げる", "下げる"), ("下げ", "下げる"),
    ("動く", "動く"), ("動い", "動く"), ("動き", "動く"),
    ("動かす", "動かす"), ("動かし", "動かす"),
    ("止まる", "止まる"), ("止まっ", "止まる"), ("止める", "止める"), ("止め", "止める"),
    ("乗る", "乗る"), ("乗っ", "乗る"), ("乗り", "乗る"), ("降りる", "降りる"), ("降り", "降りる"),
    ("飛ぶ", "飛ぶ"), ("飛ん", "飛ぶ"),
    ("歌う", "歌う"), ("歌っ", "歌う"), ("踊る", "踊る"), ("踊っ", "踊る"),
    ("笑う", "笑う"), ("笑っ", "笑う"), ("泣く", "泣く"), ("泣い", "泣く"),
    ("怒る", "怒る"), ("怒っ", "怒る"), ("驚く", "驚く"), ("驚い", "驚く"),
    ("喜ぶ", "喜ぶ"), ("喜ん", "喜ぶ"),
    ("感じる", "感じる"), ("感じ", "感じる"), ("信じる", "信じる"), ("信じ", "信じる"),
    ("伝える", "伝える"), ("伝え", "伝える"), ("伝わる", "伝わる"), ("伝わっ", "伝わる"),
    ("届く", "届く"), ("届い", "届く"), ("届ける", "届ける"), ("届け", "届ける"),
    ("払う", "払う"), ("払っ", "払う"), ("払い", "払う"),
    ("借りる", "借りる"), ("借り", "借りる"), ("貸す", "貸す"), ("貸し", "貸す"),
    ("通る", "通る"), ("通っ", "通る"), ("通り", "通る"), ("通う", "通う"),
    ("過ごす", "過ごす"), ("過ごし", "過ごす"), ("過ぎる", "過ぎる"), ("過ぎ", "過ぎる"),
    ("越える", "越える"), ("越え", "越える"), ("超える", "超える"), ("超え", "超える"),
    ("生きる", "生きる"), ("生き", "生きる"),
    ("生まれる", "生まれる"), ("生まれ", "生まれる"),
    ("育つ", "育つ"), ("育っ", "育つ"), ("育てる", "育てる"), ("育て", "育てる"),
    ("建てる", "建てる"), ("建て", "建てる"),
    ("直す", "直す"), ("直し", "直す"), ("治る", "治る"), ("治っ", "治る"),
    ("壊す", "壊す"), ("壊し", "壊す"), ("壊れる", "壊れる"), ("壊れ", "壊れる"),
    ("割る", "割る"), ("割っ", "割る"), ("割れる", "割れる"), ("割れ", "割れる"),
    ("折る", "折る"), ("折っ", "折る"), ("曲がる", "曲がる"), ("曲がっ", "曲がる"),
    ("回る", "回る"), ("回っ", "回る"), ("回す", "回す"), ("回し", "回す"),
    ("捨てる", "捨てる"), ("捨て", "捨てる"),
    ("守る", "守る"), ("守っ", "守る"), ("守り", "守る"),
    ("助ける", "助ける"), ("助け", "助ける"), ("手伝う", "手伝う"), ("手伝っ", "手伝う"),
    ("頼む", "頼む"), ("頼ん", "頼む"), ("願う", "願う"), ("願い", "願う"),
    ("描く", "描く"), ("描い", "描く"), ("撮る", "撮る"), ("撮っ", "撮る"),
    ("映る", "映る"), ("映っ", "映る"), ("光る", "光る"), ("光っ", "光る"),
    ("晴れる", "晴れる"), ("晴れ", "晴れる"), ("降る", "降る"), ("降っ", "降る"),
    ("吹く", "吹く"), ("吹い", "吹く"),
    ("流れる", "流れる"), ("流れ", "流れる"), ("流す", "流す"), ("流し", "流す"),
    ("現れる", "現れる"), ("現れ", "現れる"),
    ("隠す", "隠す"), ("隠し", "隠す"), ("隠れる", "隠れる"), ("隠れ", "隠れる"),
    ("触る", "触る"), ("触っ", "触る"), ("触れる", "触れる"), ("触れ", "触れる"),
    ("抱える", "抱える"), ("抱え", "抱える"),
    ("迎える", "迎える"), ("迎え", "迎える"),
    ("向かう", "向かう"), ("向かっ", "向かう"), ("向ける", "向ける"), ("向け", "向ける"),
    ("任せる", "任せる"), ("任せ", "任せる"),
    ("認める", "認める"), ("認め", "認める"),
    ("確かめる", "確かめる"), ("確かめ", "確かめる"),
    ("防ぐ", "防ぐ"), ("防い", "防ぐ"), ("保つ", "保つ"), ("保っ", "保つ"),
    ("扱う", "扱う"), ("扱っ", "扱う"), ("扱い", "扱う"),
    ("頑張る", "頑張る"), ("頑張っ", "頑張る"), ("頑張り", "頑張る"),
]

_NOUNS_GENERAL_EXTRA = [
    "政府", "政治", "選挙", "法律", "制度", "歴史", "文化", "伝統",
    "宗教", "科学", "数学", "物理", "化学", "生物", "医学", "病院",
    "医者", "患者", "病気", "薬", "健康", "運動", "野球", "空気",
    "温度", "速度", "重さ", "高さ", "長さ", "幅", "距離", "面積",
    "地図", "地域", "地方", "都市", "田舎", "建物", "橋", "公園",
    "警察", "消防", "軍隊", "戦争", "平和", "事件", "事故", "災害",
    "地震", "台風", "津波", "火事", "市場", "銀行", "工場", "農業",
    "漁業", "工業", "産業", "貿易", "輸出", "輸入", "景気", "物価",
    "給料", "税金", "保険", "年金", "契約", "書類", "会議", "資料",
    "予定", "目標", "成果", "課題", "提案", "意見",
    # 計画/議論 moved to _NOUNS_SAHEN (wave-430 subtype sweep — same
    # IPADIC 名詞,サ変接続 correction as 影響 above).
    "理論", "実験", "観察", "証拠", "事実", "真実", "嘘", "秘密",
    "権利", "義務", "責任", "自由", "平等", "正義", "道徳", "倫理",
    "感情", "記憶", "想像", "意識", "精神", "身体", "血", "骨",
    "筋肉", "皮膚", "心臓", "脳", "神経", "細胞", "遺伝子",
]

_NOUNS_SAHEN_EXTRA = [
    "調査", "検討", "検証", "測定", "観測", "予測", "推定", "推論",
    "学習", "訓練", "練習", "教育", "指導", "育成", "採用", "募集",
    "応募", "申請", "申し込み", "手続き", "設定", "構築", "導入",
    "展開", "配置", "配布", "配信", "送信", "受信", "通信", "接続",
    "切断", "起動", "停止", "再開", "中止", "延期", "短縮", "拡大",
    "縮小", "増加", "減少", "上昇", "低下", "改善", "改良", "修正",
    "修理", "交換", "統合", "分割", "分類", "整理", "記録", "記入",
    "翻訳", "通訳", "編集", "印刷", "撮影", "録音", "録画", "公開",
    "発売", "発行", "発見", "発明", "発生", "出現", "消滅", "存在",
]

_NOUNS_KATAKANA_EXTRA = [
    "プロセス", "スレッド", "パーティション", "シャッフル", "パイプライン",
    "スキーマ", "フォーマット", "パラメータ", "オプション", "コマンド",
    "スクリプト", "コード", "バージョン", "リリース", "アップデート",
    "インストール", "ダウンロード", "アップロード", "バックアップ",
    "セキュリティ", "パスワード", "アカウント", "ログイン", "ログアウト",
    "ブラウザ", "ウィンドウ", "スクリーン", "キーボード", "マウス",
    "プリンタ", "カメラ", "マイク", "スピーカー", "ディスプレイ",
    "バッテリー", "センサー", "ロボット", "ドローン", "チップ",
    "アルゴリズム", "ロジック", "ベンチマーク", "レイテンシ", "スループット",
    "トランザクション", "レコード", "フィールド", "マッピング",
    "ジョブ", "タスク", "ワーカー", "エグゼキュータ", "ドライバ",
    "コンテナ", "イメージング", "デプロイ", "モニタリング", "アラート",
    "ダッシュボード", "メトリクス", "トレース", "プロファイル",
    "ビジネス", "マーケティング", "マネジメント", "リーダー", "メンバー",
    "ミーティング", "プレゼン", "スケジュール", "キャンペーン",
    "サンプル", "デモ", "チュートリアル", "ドキュメント", "マニュアル",
]

_NOUNS_PROPER_EXTRA_NORM = [
    # More NEologd-style cohering entities (era/tech/web-culture compounds).
    ("生成AI", None), ("大規模言語モデル", None), ("チャットボット", None),
    ("ニューラルネットワーク", None), ("強化学習", None), ("転移学習", None),
    ("敵対的生成ネットワーク", None), ("畳み込みニューラルネットワーク", None),
    ("量子コンピュータ", None), ("自動運転", None), ("電気自動車", None),
    ("再生可能エネルギー", None), ("地球温暖化", None), ("脱炭素", None),
    ("サブスクリプション", None), ("テレワーク", None), ("リモートワーク", None),
    ("オンライン授業", None), ("電子マネー", None), ("マイナンバー", None),
    ("東京タワー", None), ("富士山", None), ("新幹線", None),
    ("山手線", None), ("渋谷スクランブル交差点", None),
    ("米津玄師", None), ("宇多田ヒカル", None), ("スタジオジブリ", None),
    ("千と千尋の神隠し", None), ("鬼滅の刃", None), ("呪術廻戦", None),
]

_NOUNS_PLACE_EXTRA = [
    "北海道", "東北", "横浜", "神戸", "札幌", "仙台", "広島", "沖縄",
    "九州", "四国", "本州", "アメリカ", "中国", "韓国", "インド",
    "イギリス", "フランス", "ドイツ", "イタリア", "スペイン", "ロシア",
    "ブラジル", "カナダ", "オーストラリア", "ヨーロッパ", "アジア",
    "アフリカ", "パリ", "ロンドン", "ニューヨーク", "北京", "上海",
    "ソウル", "台湾", "香港", "シンガポール", "タイ", "ベトナム",
]

# Kanji numerals (名詞-数) — like IPADIC, digits/numbers are first-class
# entries so 第二引数-style sequences segment at the numeral boundary.
_NUMERALS = ["一", "二", "三", "四", "五", "六", "七", "八", "九", "十",
             "百", "千", "万", "億", "兆", "数"]


def _build() -> list[tuple]:
    entries: list[tuple] = []
    for surface, pos in _PARTICLES:
        entries.append((surface, pos, 50 * max(1, len(surface)), None, None))
    for surface, pos, cost in _PARTICLES_COSTED:
        entries.append((surface, pos, cost, None, None))
    # 準体 ん (IPADIC 名詞,非自立,一般 — の contraction: 行くんだ, いい
    # んじゃない; round-8 held-out tranche).  800: far under the 1-char
    # unknown (3500) it replaces, far over every competing particle/aux
    # row, and left-gated hard by NOUN_NOMI (connection.py).
    entries.append(("ん", "名詞-非自立-一般", 800, None, None))
    # やつ (IPADIC 名詞,非自立,一般 — audit 160): や+つが shred in
    # running text; the noun tier 1200 beats the grouped unknown (4000+)
    # while おやつ (1500, fused row) still wins its own surface (お
    # prefix 800 + やつ 1200 = 2000 > 1500) and the やつれる paradigm
    # keeps its verb rows (れる cannot attach to a noun).
    entries.append(("やつ", "名詞-非自立-一般", 1200, None, None))
    # Wi-Fi (NEologd row): the unknown path splits at the hyphen (PUNCT
    # char class) — Wi+Fi (round-8 held-out tranche, s463).  Contains
    # '-', so it can never match inside a pure-alnum line and the ASCII
    # fast-path gate (ascii_matchable_surfaces: [A-Za-z0-9 ]+ fullmatch)
    # is provably unaffected.
    entries.append(("Wi-Fi", "名詞-固有名詞-一般", 1200, None, None))
    # ほんと (IPADIC row — 本当's informal spelling; round-8 tranche
    # s512: the unknown run swallowed ほんとにあるんだと whole).  The
    # all-hiragana 1150 tier (wave-350 class).
    entries.append(("ほんと", "名詞-一般", 1150, None, None))
    for surface in _AUX:
        entries.append((surface, "助動詞", 100, None, None))
    for surface, base in _VERBS:
        entries.append((surface, "動詞-自立", 1200, base, None))
    for surface, base in _ADJECTIVES:
        entries.append((surface, "形容詞-自立", 1200, base, None))
    # 言う's kana 音便/連用形 rows at 1500, AFTER the adjective tier
    # (audit 170 — see the _VERBS note): いっ must lose plain ties to
    # いく's 促音便 row (うまく|いっ|た lemmatizes to いく, IPADIC's
    # pricing) and いい must lose adjectival contexts to the 形容詞 row
    # (天気が|いい), while と+いい+ます keeps the verb via the 連用形→
    # 助動詞 -800 reward the adjective's 基本形 class cannot collect.
    entries.append(("いっ", "動詞-自立", 1500, "いう", None))
    entries.append(("いい", "動詞-自立", 1500, "いう", None))
    for surface in _ADJ_NOUN_STEMS:
        entries.append((surface, "名詞-形容動詞語幹", 1500, None, None))
    for surface in _CONJ:
        entries.append((surface, "接続詞", 300, None, None))
    for surface in _NOUNS_GENERAL:
        entries.append((surface, "名詞-一般", 1500, None, None))
    for surface in _NOUNS_SINGLE_KANJI:
        entries.append((surface, "名詞-一般", 1500, None, None))
    for surface in _NOUNS_SINGLE_KANJI_POSITIONAL:
        entries.append((surface, "名詞-非自立-副詞可能", 1500, None, None))
    for surface in _NOUNS_SAHEN:
        entries.append((surface, "名詞-サ変接続", 1500, None, None))
    for surface in _NOUNS_ADVERBIAL:
        entries.append((surface, "名詞-副詞可能", 1500, None, None))
    for surface in _PRONOUNS:
        entries.append((surface, "名詞-代名詞-一般", 1200, None, None))
    for surface in _NOUNS_KATAKANA:
        entries.append((surface, "名詞-一般", 1500, None, None))
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
    for surface, pos in _SUFFIXES_COUNTER_1500:
        entries.append((surface, pos, 1500, None, None))
    entries.append((*_SUFFIX_COUNTER_TSU[:2], _SUFFIX_COUNTER_TSU[2], None, None))
    entries.append((*_SUFFIX_PLURAL_RA[:2], _SUFFIX_PLURAL_RA[2], None, None))
    # らし — らしい's ガル接続 form (IPADIC 助動詞, 形容詞・イ段, base
    # らしい; round 12, audit 162): the noun+らしさ nominalization reads
    # noun|らし|さ in MeCab (自分らしさ → 自分|らし|さ).  Noun-only
    # attachment via connection.SUFFIX_RA (priced out everywhere else so
    # 暮らし/鳴らし/減らし 連用形 rows keep their surfaces); right side
    # ADJ_GARU so さ attaches the adjective-stem way.  2900 (net 200
    # after nouns), NOT ら's 3600: at net 900 the ら-final pronouns lost
    # their own suffix read (彼らしさ read 彼ら+し+さ through the 終助詞
    # さ at ~1500 total; net 200 makes 彼|らし|さ win at ~1400 while
    # らしい's 100-cost row still beats らし+い everywhere, and 彼ら+
    # らし+さ keeps the lexicalized pronoun whole — probe set in
    # BASELINE.md).  Base form folds to らしい.
    entries.append(("らし", "助動詞", 2900, "らしい", None))
    for surface in _ADVERBS:
        entries.append((surface, "副詞-一般", 1000, None, None))
    for surface in _ADNOMINAL:
        entries.append((surface, "連体詞", 400, None, None))
    for surface in _INTERJECTIONS:
        entries.append((surface, "感動詞", 1000, None, None))
    for surface in _FILLERS:
        entries.append((surface, "フィラー", 1000, None, None))
    # NEologd-style date entries (1日..31日, 1月..12月) — why README's golden
    # keeps 10日 as a single token (README.md:29).
    for d in range(1, 32):
        entries.append((f"{d}日", "名詞-固有名詞-一般", 900, None, None))
    for m in range(1, 13):
        entries.append((f"{m}月", "名詞-固有名詞-一般", 900, None, None))
    # Round-2 growth tiers (same costs as their base categories).
    for surface, base in _VERBS_EXTRA:
        entries.append((surface, "動詞-自立", 1200, base, None))
    for surface in _NOUNS_GENERAL_EXTRA:
        entries.append((surface, "名詞-一般", 1500, None, None))
    for surface in _NOUNS_SAHEN_EXTRA:
        entries.append((surface, "名詞-サ変接続", 1500, None, None))
    for surface in _NOUNS_KATAKANA_EXTRA:
        entries.append((surface, "名詞-一般", 1500, None, None))
    for surface, norm in _NOUNS_PROPER_EXTRA_NORM:
        entries.append((surface, "名詞-固有名詞-一般", 500, None, norm))
    for surface in _NOUNS_PLACE_EXTRA:
        entries.append((surface, "名詞-固有名詞-地域-一般", 1200, None, None))
    for surface in _NUMERALS:
        entries.append((surface, "名詞-数", 1300, None, None))
    return entries


BUILTIN_ENTRIES: list[tuple] = _build()
