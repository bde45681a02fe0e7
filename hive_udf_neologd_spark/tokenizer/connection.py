"""Coarse connection-cost (bigram) matrix for the Viterbi lattice.

The reference's tokenizer minimizes word cost PLUS a connection cost
between adjacent lattice nodes, read from the dictionary's compiled
``matrix.def`` (the MeCab build at reference ``build.sh:161`` produces the
1316×1316 left/right-context matrix; ``build.sh:249`` compiles it into
Kuromoji's binary ``ConnectionCosts`` resource).  Before round 6 this
engine scored word costs only — and had hit the exact wall that causes
(its own pinned negative result, VERDICT r5 'What's missing' #1): the
hiragana カ変 fused forms きた/きます could not be added because, without
a connection preference for 連用形+助動詞, で+きた out-competes でき+た
inside できた/できます.

This module is the engine's ``matrix.def`` analog at coarse granularity:
connection CLASSES derived from the POS system (+ conjugation form when a
MeCab CSV provides one) instead of IPADIC's 1316 context ids, and an
authored sparse matrix over those classes.  Design rules:

* The matrix is SPARSE with default 0: any pair not listed costs nothing,
  so the all-zero matrix is provably output-identical to the pre-matrix
  engine (the Viterbi keeps per-(position, right-class) minima; with all
  connections 0 the per-position minimum dominates exactly as before).
* Entries are authored the way dictionary waves are: each one justified,
  golden-verified, and kept minimal.  Negative costs REWARD canonical
  bigrams rather than penalizing rare ones — rewards only reorder paths
  that both exist in the dictionary, so unknown-word behavior is stable.

Current authored entries (round 6):

* 連用形/連用タ接続/連用テ接続 → 助動詞 (でき+た, 聴い+た, 高かっ+た):
  the single most canonical bigram in Japanese; -800 makes the
  inflection+aux split
  robustly beat any path that steals the verb's first character (で+きた),
  which is what unblocks fused カ変 rows きた/きます as dictionary
  entries — the r5 pinned negative result, now a positive golden
  (tests/test_tokenizer.py::TestConnectionMatrix).
"""

from __future__ import annotations

# Connection classes.  DEFAULT covers unknown-word nodes and any POS not
# listed; BOS marks the start-of-text context (reserved for future
# authored rows — e.g. penalizing sentence-initial auxiliaries).
DEFAULT = 0
BOS = 1
NOUN = 2
PARTICLE = 3
AUX = 4
VERB_BASE = 5
VERB_CONJ = 6    # conjugated, NON-連用: 未然/仮定/命令/ガル接続 …
ADJ_BASE = 7
ADJ_CONJ = 8
VERB_CONT = 9    # 連用形 / 連用タ接続 / 連用テ接続 — the aux-attachment state
ADJ_CONT = 10
AUX_NAI = 11     # the auxiliary ない alone — 未然形's canonical partner
AUX_U = 12       # う (volitional) — attaches only to 未然ウ接続 / aux
VERB_CONJ_U = 13 # 未然ウ接続 verb rows (行こ) — う's attachment site
ADJ_CONJ_U = 14  # 未然ウ接続 adjective rows (高かろ)
AUX_N = 15       # ん (ぬ/の contraction) — attaches only to 未然形 / aux
AUX_VATT = 16    # れ/せ/られ/させ/れる/…/ぬ — attach only to 未然形・連用形
AUX_TAI = 17     # たい/たく — attach only to 連用形
VERB_CONT_REN = 18  # GODAN 連用形 (焼き/飲み) — takes ます/たい, NOT た/ない
AUX_TA = 19      # た — attaches to 連用タ接続/ichidan stems/aux, NOT 五段連用形
AUX_NAKU = 20    # なく (ない 連用テ接続) — like ない but NOT after particles
AUX_VSTEM = 21   # RIGHT class of the passive/causative stems れ/られ/せ/
                 # させ: a 連用形-like attachment state — ず/ぬ/たい may
                 # follow (知られ+ず, 褒められ+たい) where the generic
                 # AUX right class keeps them BLOCKed (だ+れ must never
                 # resurrect the だれ shred)
AUX_COP = 22     # polite copula です/でし/でしょ — NEVER after verb
                 # 連用形 (×通りです as 通る+です; IPADIC's matrix makes
                 # this pair enormous), so deverbal nouns like 通り can
                 # win nominal contexts.  だ gets AUX_DA below: same
                 # idea, but with the voiced-音便 past-tense exception.
AUX_DA = 24      # だ alone — copula after nouns (静か+だ, の+だ) AND the
                 # voiced past auxiliary after ガ/ナ/バ/マ行 音便 stems
                 # (飲ん+だ, 泳い+だ).  NOT legal after plain 連用形:
                 # 見通しだ/頼みだ must read the deverbal NOUN + copula,
                 # not 見通す連用+だ — exactly the です/AUX_COP situation,
                 # except だ has the phonological 音便 exception below.
VERB_CONT_DA = 25  # voiced 連用タ接続 (飲ん, 死ん, 遊ん, 泳い): takes
                 # だ/で, never た (×飲んた) — the ガ/ナ/バ/マ行 half of
                 # the 音便 split; unvoiced 音便 (書い, 買っ) stays
                 # VERB_CONT and keeps た.
PARTICLE_DE = 29  # the conjunctive で alone (飲ん+で, 泳い+で): same
                 # noun-side penalty as て, but NO 連用形 reward — で
                 # attaches to VOICED 音便 stems only, and rewarding
                 # VERB_CONT+で let 群れ(stem)+で steal the noun's case
                 # reading in 群れで行動する (caught by the pinned
                 # te-split test when the て reward landed in wave 355).
AUX_TA_R = 28  # た's RIGHT class (what may follow た): legal successors
                 # are particles/nouns (連体形 行った人), ん (食べた+ん+だ)
                 # and other auxiliaries — but NOT a bare continuative verb
                 # stem (verb-verb continuation goes through て), which is
                 # the reroute that kept shredding もったいない as
                 # もっ+た+い(いる)+ない after the ONBIN blocks landed.
                 # Mirrors generic AUX's left-side blocks (れ/たい) below.
VERB_ONBIN = 27  # UNVOICED 音便 stems (促音便 行っ/買っ, カ行イ音便
                 # 書い/聞い — cform 連用タ接続 outside the voiced
                 # ガ/ナ/バ/マ行 split): the only things that attach are
                 # た (行っ+た, rewarded) and the particles て/たり
                 # (行っ+て, 買っ+たり — sparse default).  ます/たい/ない/
                 # れる/です are ungrammatical here (they take 連用形/
                 # 未然形, which godan verbs reach via 行き/行か) — the
                 # lumped VERB_CONT class rewarded 持っ+たい, which is
                 # what shredded もったいない into もつ+たい+ない
                 # (self-coverage audit after wave 349).
PARTICLE_TE = 26  # the conjunctive particles て/で (助詞-接続助詞 rows
                 # only — で's 格助詞 row stays generic so 公園で is
                 # untouched): te-forms attach to 連用/音便 stems, never
                 # to nouns, so a +200 after NOUN makes a tied verb stem
                 # win て-contexts (群れ+て+いる must lemmatize 群れる,
                 # not read the wave-349 deverbal noun 群れ) — the exact
                 # mirror of PARTICLE_CASE, which tips the SAME ties the
                 # other way before を/が/の.
PARTICLE_CASE = 23  # を/が/の — a small authored PENALTY (not BLOCK)
                 # after verb 連用形: ×読みを/×読みが/×読みの are
                 # ungrammatical, so a tied deverbal NOUN row (占い,
                 # 考え, 痛み) wins nominal contexts the way IPADIC's
                 # matrix decides them.  に is deliberately generic:
                 # 買い+に+行く (purposive 連用形+に) is grammatical.
                 # Penalty not BLOCK: with no noun alternative the verb
                 # parse must survive (連用中止 before を-less gaps).
PARTICLE_TTE = 42  # the quotative/topic って (格助詞-連語) alone — its
                 # LEFT class: って attaches to nominals, terminal
                 # verb/adjective forms and auxiliaries (田中って人,
                 # 行くって, ですって, いいなって) but never to another
                 # particle — や+って was outbidding やっ+て (やる促音便)
                 # in every やってきた (audit 123; the same thief class
                 # as な+って, now closed at the って side for ALL
                 # particles).  終助詞 な carries its own right class so
                 # いいなって stays legal.
NOUN_KD = 41  # RIGHT class of 名詞-形容動詞語幹 rows (大事/静か/きれい):
                 # 語幹+な is THE canonical na-adjective bigram and IPADIC
                 # rewards it hard — without the reward the cheap 接続詞
                 # なお (300) outbid な+お in 大事なお知らせ (audit 120).
                 # Left side stays NOUN; every (NOUN, y) rule is mirrored.
AUX_NA_R = 40  # 助動詞 な's RIGHT class (round-7 audit 120): 体言接続
                 # means its successors are nominals and の-family
                 # particles ONLY (静か+な+人, 雨+な+ので, 好き+な+の+だ)
                 # — never another auxiliary: 日+な+た outbid the 日なた
                 # noun through the generic AUX right class (な 100 +
                 # た 100 < any 1500-tier noun).
AUX_MAI = 39  # まい (negative volitional 助動詞): legal after 終止形
                 # (行く+まい) and auxiliaries (ます+まい); blocked after
                 # every stem/nominal/particle context — see the
                 # entry_classes branch.
NOUN_SOU = 38  # the 接尾 そう row (名詞,接尾,助動詞語幹 — appearance
                 # そうだ): attaches to ガル接続 stems (高+そう) and 連用形
                 # stems (降り+そう, 読み+そう) ONLY.  Its right side is
                 # NOUN, which is what lets 助動詞 な follow (高そう+な —
                 # the AUX_NA noun-only constraint broke 〜そうな until
                 # this row existed; the 副詞 そう row is DEFAULT-class
                 # and な is blocked after it).
NOUN_SA = 37  # the 接尾 さ row alone (round 7, さ-nominal redesign):
                 # IPADIC reads non-lexicalized degree nouns as ガル接続
                 # stem + 名詞,接尾,特殊 さ (美し+さ) — さ attaches ONLY
                 # to adjective stems (ADJ_GARU) and 体言/形容動詞語幹
                 # (NOUN: 穏やか+さ); blocking every other left context
                 # keeps the cheap single-kana row out of hiragana words
                 # (×か+さ, ×く+さ).
ADJ_GARU = 36  # 形容詞 ガル接続 stem rows (高/美し/嬉し): the attachment
                 # site of さ/そう/がる — split out of ADJ_CONJ so さ's
                 # hard left constraint can name it (and so 未然ウ/仮定形
                 # rows can never take さ: ×高けれ+さ).
PREFIX = 35  # 接頭詞 rows (お/ご, round 7): the honorific prefixes were
                 # previously single-char UNKNOWN nodes (4400), which is
                 # why お+かけ (5600) lost to おか+けし (2400) and every
                 # rich-output prefix carried the wrong POS.  A prefix
                 # attaches to nominals/adjectives/deverbal stems ONLY —
                 # the block loop below prices out お+particle and
                 # お+auxiliary so the cost-800 rows cannot shred hiragana
                 # function-word sequences.
PARTICLE_SHI = 34  # the 接続助詞 し alone — its RIGHT class: し ends a
                 # coordinated clause, so よう can never follow it
                 # (×勉強+し+よう — the volitional is 勉強+しよ+う, and
                 # the 50-cost particle was underpricing the しよ row).
                 # Its left side stays a generic particle: 出発し、/
                 # 相談し、(サ変 noun + し) keep the cheap particle row —
                 # boundary-identical to MeCab's サ変 noun + する連用形
                 # parse, which a coarse 35-class matrix cannot split
                 # from the 出+発し verb-verb reading without a dedicated
                 # サ変 reward tier.  Mirrors every (PARTICLE, y) rule.
AUX_YOU = 33  # よう (助動詞): attaches to 連体/基本形 (来る+よう, ない+
                 # よう, た+よう) — NEVER to a 連用形 stem: IPADIC
                 # lexicalizes the volitional as its own 未然ウ接続 row
                 # (食べよ+う, しよ+う), and the generic −800 連用形→AUX
                 # reward was letting 食べ+よう (500) outbid 食べよ+う
                 # (1300) — the round-7 parity corpus measured it.
AUX_NA = 32  # だ's 体言接続 な (助動詞): legal after 体言 ONLY (雨+な+
                 # ので, 静か+な) — IPADIC's matrix prices な out
                 # everywhere else, and so does the block loop below:
                 # に+な+って and よく+な+って must never outbid なっ
                 # (なる連用タ接続), whose word cost is 1200 against the
                 # 100-cost な.
PARTICLE_NA = 31  # the 終助詞 な alone (round-7 parity corpus): it
                 # follows terminal forms (行く+な, いい+な+って) but
                 # NEVER a continuative/音便 stem — without the block the
                 # 50-cost な + the 100-cost quotative って outpriced the
                 # 1200-cost verb row なっ in EVERY 〜なって (寒くなって
                 # read 寒く+な+って since wave 353 shipped って; found by
                 # the parity corpus, invisible to token-output goldens
                 # because both readings POS-stop-filter away).
PARTICLE_CONJ_V = 30  # のに/ので (助詞-接続助詞, genuine IPADIC rows,
                 # round-7 parity corpus): they attach only to 用言/
                 # 助動詞 (安い+ので, 行く+のに, まし+たら+…), NEVER to
                 # nouns/particles/BOS — blocking those keeps 車の+におい
                 # and every genitive の+に reading intact while the
                 # one-row のに/ので win their verb-adjacent contexts the
                 # way MeCab's matrix decides them.
PARTICLE_JA = 43  # じゃ (では contraction, 助詞-副助詞) and じゃん
                 # (終助詞) — round-8 held-out tranche (ho_casual):
                 # both attach to 体言/連体形/助動詞 (学生じゃない,
                 # できる+じゃ+ない+か, 言ってない+じゃん, 言った+じゃん)
                 # and NEVER to particles/stems/BOS — without the left
                 # restriction the cheap rows would shred hiragana
                 # sequences the way bare な did (PARTICLE_NA history).
NOUN_NOMI = 44  # 準体 ん (名詞-非自立 — the の contraction: 行く+ん+だ,
                 # いい+ん+じゃない, 食べた+ん+だ, そんな+ん).  IPADIC
                 # carries ん as 名詞,非自立,一般; its attachment sites
                 # are 連体形 contexts only: verb/adjective base forms,
                 # auxiliaries (ない/てる/た), and 連体詞/unknown runs
                 # (DEFAULT).  The single-kana row would shred everything
                 # else, so every other left context is blocked.  Right
                 # side is NOUN: ん+だ (copula after 体言), ん+です,
                 # ん+じゃ all inherit noun behavior.
AUX_DATT = 45  # だっ's RIGHT class (だ's 連用タ接続, IPADIC 特殊・ダ):
                 # its ONLY legal successors are た/たら (最高だっ+た,
                 # 雨だっ+たら) — the generic AUX right class let
                 # だっ+て outbid だ+って in なるんだって (round-8
                 # held-out tranche, ho_casual s509).
PARTICLE_WA = 47  # 終助詞 わ alone: it shared な's PARTICLE_NA class in
                 # the first tranche-2 wave, but the soft-imperative
                 # opening (連用形+な, s514/s516) is な-specific — わ
                 # after a 連用形 is ungrammatical, and the shared class
                 # re-shred いわし into い(いる連用)+わ+し (round-8
                 # self-coverage re-audit).  Same block profile as な
                 # MINUS the 連用形 openings.
AUX_DARI = 48  # だり's LEFT class: IPADIC 並立助詞 だり attaches ONLY to
                 # voiced 音便 stems (やん+だり, 泳い+だり) — unlike だ
                 # (AUX_DA), which must stay open after particles/nouns
                 # for the copula (の+だ); sharing AUX_DA let ね(終助詞)+
                 # だり shred ねだり (self-coverage re-audit).
PARTICLE_DEMO = 46  # でも (副助詞 — 誰にでも, 子供でも分かる): attaches
                 # to 体言 and — via a TUPLE override, the first place
                 # the mechanical layer distinguishes contexts the
                 # coarse classes lump — to 格助詞 rows (に+でも, から+
                 # でも) but NEVER to the 接続助詞 て/で or to 音便
                 # stems: a generic-particle でも would have merged
                 # every te-form 飲ん+で+も into 飲ん+でも (corpus 231
                 # pins なく/て/も).  Round-8 held-out tranche 2, s557.
NUM_UNK = 49  # unknown ARABIC-DIGIT runs' RIGHT class (round 12): an
                 # exact copy of DEFAULT's authored row (so every block/
                 # penalty a digit context had keeps holding) PLUS the
                 # 数→つ counter reward (COUNTER_TSU below).
                 # Deliberately NOT shared with the kanji-numeral
                 # 名詞-数 DICTIONARY rows: the lexicon carries fused
                 # kanji-number compounds (一人, 一時, 一つ…) whose
                 # pinned whole readings a class-level reward would
                 # re-split; arabic-digit runs have no fused competitors
                 # except the NEologd date entries (10日/3月 at 900),
                 # which the split can never reach (the digit run's own
                 # 3500 unknown cost comes first).
COUNTER_TSU = 50  # the counter つ's LEFT class (round 12, VERDICT r11
                 # #2 "must win after 数 and lose elsewhere"): +800
                 # from EVERY left class except NUM_UNK (blanket loop
                 # below — counters attach to numbers; every other
                 # neighbor is a thief context: い+つ undercut いつ's
                 # 2-char rung inside いつまでに, や+つ undercut やつ
                 # when つ briefly shared the generic 助数詞 tuple),
                 # and -2700 from NUM_UNK so digit+つ reads
                 # 数|助数詞 (1つください → つ 3600-2700+ください 1200
                 # = 2100 < つく+ださい 2400).  Being a COARSE class,
                 # the +800 reaches live-as-left tuple ids through the
                 # (group_rc, COUNTER_TSU) fallback — no liveness
                 # change, no canonicalization side effects.
SUFFIX_RA = 51  # the plural/collective suffix ら's LEFT class (round 12,
                 # audit 161 — the class the audit-160 note deferred):
                 # IPADIC carries ら as 名詞,接尾,一般 (子供ら, 容疑者ら
                 # — ubiquitous in news text), but a cheap 1-char
                 # hiragana row is a lattice thief everywhere EXCEPT
                 # right after a noun (さく+ら, ば+ら, や+つ+ら…), so it
                 # mirrors COUNTER_TSU: +800 from EVERY left class
                 # (blanket loop below), -2700 from NOUN — noun rows'
                 # right side, reached for tuple-id noun rows through
                 # the (group_rc, SUFFIX_RA) fallback.  Net after a
                 # noun: 3600-2700 = 900, the vetted suffix band —
                 # 子供+ら(900)+が(50) beats 子供+らが(unknown 4400+);
                 # lexicalized ら-final rows are untouchable (彼ら/
                 # これら/こちら/傍ら/平ら at ≤1500 vs prefix-noun
                 # (≥900) + ら(900) ≥ 1800, and さく/ば aren't noun
                 # rows at all); noun+らしい keeps its 助動詞 row
                 # (らしい ≤1200 vs ら(900)+しい(unknown 4400+)).
TARA_R = 52  # たら's RIGHT class (round 12, audit 166): たら is た's
                 # 仮定形 — a CONDITIONAL, so unlike bare た (連体形;
                 # the もったいない guard) a following clause may open
                 # with a 連用形 verb (開けたら出てきた → 開け|たら|
                 # 出|て|き|た in MeCab).  Sharing AUX_TA_R blocked
                 # たら+VERB_CONT, so an unknown single ら stole the
                 # split (開け|た|ら|出 — ho15_tara pre-fix).  The
                 # class is an exact copy of AUX_TA_R's authored row
                 # (the NUM_UNK copy mechanism, below) with ONE
                 # divergence: (TARA_R, VERB_CONT) opens at 200.  Every
                 # other た-side discipline (×たら+れる, ×たら+たい,
                 # ×たら+ない) is inherited verbatim.
N_CLASSES = 53

# Declared schema version of the CLASS-ASSIGNMENT mapping (entry_classes):
# the marshal-precompiled dictionary snapshot bakes each row's (lc, rc)
# ids, so ANY change to how entry_classes maps (pos, cform, ctype) →
# classes MUST bump this constant — snapshot_digest (dictionary.py) folds
# it into the marshal guard digest.  Comment-only / cost-matrix-only edits
# do NOT need a bump (CONNECTION_COSTS is applied at runtime, never
# baked).  A forgotten bump is caught by CI:
# tests/test_dictionary_asset.py::test_binary_load_equals_csv_parse
# compares the marshal rows tuple-for-tuple against a fresh CSV parse.
# v2: 形容詞 ガル接続 rows moved ADJ_CONJ → ADJ_GARU (round-7 さ-nominal
# redesign) — existing baked ids changed meaning for those rows.
# v3: 名詞-形容動詞語幹 rows gained the dedicated right class NOUN_KD
# (round-7 audit 120 — the 語幹+な reward site).
# v4: round-8 held-out tranche — new classes PARTICLE_JA (じゃ/じゃん),
# NOUN_NOMI (準体 ん), AUX_DATT (だっ right side); 終助詞 わ joins な's
# PARTICLE_NA branch; なきゃ joins the ない family; だって/しか/なあ are
# new generic-particle surfaces (no class change but new rows).
# v5: mechanical tuple classes (VERDICT r7 #3) — (pos, ctype, cform)
# tuples get ids above the N_CLASSES behavior classes; overridden
# (連体詞, カ行イ音便未然形) now bake their own canonical ids.  Any
# TUPLE_OVERRIDES edit re-canonicalizes baked ids → bump this again.
# v6: tranche-2 fixes — PARTICLE_DEMO (でも), だり joins AUX_DA's left
# class, new tuple overrides (格助詞→でも open, 係助詞→格助詞 penalty).
# v7: self-coverage re-audit — わ splits out of PARTICLE_NA
# (PARTICLE_WA: no 連用形 opening), だり gets AUX_DARI (voiced-音便-only
# left, unlike the copula-open AUX_DA it briefly shared).
# v8: tranche-3 fix — new tuple override (godan 連用形 → か) penalizing
# the なり+か+ね shred; か attaches to 終止/連体/体言, never a 連用形.
# v9: tranche-4 fixes — あろ joins _IRREGULAR_MIZEN_U (であろ+う), べから
# gets the (AUX, AUX_VSTEM) pair so ず attaches (恐れる+べから+ず).
# v10: audit-135 counter tier — particle→助数詞 tuple penalties (+800,
# six particle left classes) so the 40 new counter rows cannot tie real
# compounds through free particle edges.
# v11: tranche-5 fixes — the noun→PARTICLE_DEMO +100 penalty removed
# (its premise was round-1's uncorrected s319 pin); でも repriced 95.
# v12: tranche-5 follow-up audit — particle→接続詞 tuple penalties
# (+800) keep connectives clause-initial (の+ところで stays split).
# v13: tranche-6 fixes — (AUX → 格助詞連語) +800 so として cannot steal
# the volitional quotative; みたい joins PARTICLE_JA's left profile;
# ものの joins のに/ので's PARTICLE_CONJ_V.
# v14: ADVICE-r8 scoping — the カ行イ音便 未然形 tuple id is now carried
# ONLY by the とく family (base_form とく); every other ka-gyo 未然形 row
# (書か, 聞か, 置か...) canonicalizes to its coarse group so the
# (VERB_ONBIN → 未然形) ておく-contraction reward cannot leak onto
# generally ungrammatical bigrams.
# v15: round-12 counter つ — two new behavior classes (NUM_UNK for
# unknown digit runs, COUNTER_TSU for つ's surface-scoped left) shift
# every tuple id by 2, and the live-particle counter-penalty closure
# adds exact-pair overrides.
# v16: round-12 audit 161 — SUFFIX_RA (the plural suffix ら's
# surface-scoped left class) shifts every tuple id by 1.
# v17: round-12 audit 166 — TARA_R (たら's dedicated right class)
# shifts every tuple id by 1.
# v18: round-13 audit 170 — the 五段・カ行促音便 paradigm (行く/いく/
# 逝く/往く) adds five (動詞-自立, 五段・カ行促音便, *) tuples mid-table,
# shifting every tuple id after them by 5.
CLASS_SCHEMA_VERSION = 18

# 連用 (continuative) forms — the state auxiliaries attach to (聴い+た,
# でき+ます, 高かっ+た).  Deliberately NOT including 未然形: rewarding
# 未然形+助動詞 re-analyzes lexicalized causatives (済ませて would become
# 済ま+せ+て and re-lemmatize to 済む — caught by the T18 golden suite in
# round 6 and excluded by construction).
_RENYO_FORMS = frozenset({"連用形", "連用タ接続", "連用テ接続"})

# 未然ウ接続 — the only conjugation form the volitional う attaches to;
# its own class so う's hard constraint can distinguish it from ガル接続
# and 仮定形 (めんどう must NOT parse as めんど(ガル)+う).
_MIZEN_U_FORMS = frozenset({"未然ウ接続"})

# Irregular 未然形 surfaces in the cform-less hand lexicon (see the
# fallback in entry_classes): サ変 さ/せ.  くる's 未然形 こ is single-char
# and length-filtered out of the dictionaries, so it never reaches here.
_IRREGULAR_MIZEN = frozenset({("さ", "する"), ("せ", "する")})

# Irregular 未然ウ接続 surfaces in the cform-less hand lexicon: サ変 しよ
# (勉強しよ+う) and カ変 来よ/こよ — the volitional attachment sites IPADIC
# lexicalizes as their own rows (round-7 AUX_YOU work).
_IRREGULAR_MIZEN_U = frozenset({("しよ", "する"), ("来よ", "来る"),
                                ("こよ", "くる"),
                                # ラ変 ある's あろ (であろ+う, tranche 4)
                                ("あろ", "ある")})

# Irregular 命令形 surfaces in the cform-less hand lexicon: カ変 来い
# (round-8 held-out tranche).  Imperatives are non-連用 conjugated forms
# — VERB_CONJ, so no auxiliary may follow (the cont fallback would have
# handed 来い the 連用形 rewards).
_IRREGULAR_CONJ = frozenset({("来い", "来る")})

# Other conjugated (non-terminal, non-連用) forms.  命令ｉ is NOT here:
# for ラ行特殊 verbs (くださる/なさる/いらっしゃる) it doubles as the
# マス接続 stem (ください+ます, なさい+ませ — IPADIC conjugates these
# as 特殊・マス), so it takes the VERB_CONT_REN class below; the generic
# conj class would hit the 未然形+AUX block and shred ご了承くださいます
# into く+ださい+ます (wave-351 keigo audit).
_OTHER_CONJ_FORMS = frozenset({
    "未然形", "未然ヌ接続", "未然レル接続", "仮定形",
    "ガル接続", "体言接続", "命令ｒｏ", "命令ｙｏ", "命令ｅ",
})


# --- mechanical tuple classes (round 8, VERDICT r7 #3) ---------------------
# matrix.def keys costs on context ids derived from the full feature
# tuple; the engine's analog: every (pos, conj_type, conj_form) tuple
# realized in the snapshot + hand lexicon (tokenizer/conn_tuples.py,
# GENERATED by tools/gen_conn_classes.py) gets an id above the
# N_CLASSES authored behavior classes.  Each tuple id carries the coarse behavior
# GROUP the classification below always produced (computed by running
# entry_classes itself on the bare tuple, so the mapping can never drift
# from the logic), and TUPLE_OVERRIDES prices individual tuple pairs the
# way matrix.def prices context-id pairs.  CANONICALIZATION: an id named
# by no override collapses back to its group before it ever reaches a
# DictEntry, so the lattice's per-position live-state count is unchanged
# wherever no finer rule exists — full granularity in addressing, zero
# runtime cost until a rule uses it.  The three dicts below are filled
# at module bottom (after the authored matrix), in dependency order.
TUPLE_IDS: dict[tuple[str, str, str], int] = {}
_CANON_LC: list[int] = []
_CANON_RC: list[int] = []


def _tupleize(lc0: int, rc0: int, pos: str, ctype: str | None,
              cform: str | None) -> tuple[int, int]:
    """Swap a tuple-determined class pair for its canonical mechanical
    ids.  Inert while TUPLE_IDS is empty (bootstrap: group computation
    runs entry_classes before the table is filled)."""
    mid = TUPLE_IDS.get((pos, ctype or "", cform or ""))
    if mid is None:
        return (lc0, rc0)
    k = mid - N_CLASSES
    return (_CANON_LC[k], _CANON_RC[k])


def entry_classes(
    pos: str,
    base_form: str | None = None,
    surface: str = "",
    cform: str | None = None,
    ctype: str | None = None,
) -> tuple[int, int]:
    """Map one dictionary entry to (left_class, right_class).

    ``cform`` (the MeCab CSV conjugation-form column) gives the precise
    conjugated/terminal split when available; entries without it (the
    hand-built lexicon's 5-tuples) fall back to the base-form heuristic —
    a verb/adjective row carrying a base_form different from its surface
    is a conjugated form (that is exactly when the generator sets one)."""
    top = pos.split("-", 1)[0] if pos else ""
    if top == "接頭詞":
        return _tupleize(DEFAULT, PREFIX, pos, ctype, cform)
    if top == "名詞":
        # The 接尾 さ row: see NOUN_SA.  Its RIGHT side is an ordinary
        # noun (美しさ+を, 高さ+だ).  げ (うれし+げ, 不安+げ — IPADIC
        # 名詞,接尾,形容動詞語幹) shares さ's attachment sites but makes
        # a 形容動詞語幹: its right side is NOUN_KD so な/に attach the
        # na-adjective way (うれしげ+な+表情).
        if surface == "さ" and "接尾" in pos:
            return (NOUN_SA, NOUN)
        if surface == "つ" and "助数詞" in pos:
            # The hiragana counter (round 12): see COUNTER_TSU.
            return (COUNTER_TSU, NOUN)
        if surface == "ら" and "接尾" in pos:
            # The plural/collective suffix (round 12, audit 161): see
            # SUFFIX_RA.  Right side is an ordinary noun (子供ら+が,
            # 容疑者ら+は, sentence-final 奴ら。).
            return (SUFFIX_RA, NOUN)
        if surface == "げ" and "接尾" in pos:
            return (NOUN_SA, NOUN_KD)
        if surface == "そう" and "接尾" in pos:
            return (NOUN_SOU, NOUN)
        # 準体 ん (名詞-非自立): see NOUN_NOMI — 連体形-context attachment
        # only, noun behavior on the right (round-8 held-out tranche).
        if surface == "ん" and "非自立" in pos:
            return (NOUN_NOMI, NOUN)
        if surface == "みたい" and "形容動詞語幹" in pos:
            # みたい (IPADIC 名詞,形容動詞語幹 — 子供みたい, 夢みたい):
            # PARTICLE_JA's left profile is exactly its attachment set
            # (体言/連体形/助動詞) and — critically — BLOCKs the 格助詞
            # lefts, so を+みたい keeps reading 見る's 連用 み+たい
            # (映画をみたい).  Right side NOUN_KD: みたい+な/に.
            return (PARTICLE_JA, NOUN_KD)
        if "形容動詞語幹" in pos:
            return _tupleize(NOUN, NOUN_KD, pos, ctype, cform)
        c = NOUN
    elif top == "助詞":
        # を/が/の carry the penalty left class (see PARTICLE_CASE);
        # their right class stays PARTICLE so downstream pairs are
        # untouched.
        # は/も stay generic: 連用形+は/も+する (読みはした) is real
        # grammar; に stays generic for the purposive 買い+に+行く.
        if surface in ("を", "が", "の", "と", "へ", "まで", "より"):
            return (PARTICLE_CASE, PARTICLE)
        # Conjunctive て/で only (で's 格助詞 row falls through to the
        # generic class): see PARTICLE_TE / PARTICLE_DE.
        if surface == "て" and "接続助詞" in pos:
            return (PARTICLE_TE, PARTICLE)
        if surface == "で" and "接続助詞" in pos:
            return (PARTICLE_DE, PARTICLE)
        if surface in ("のに", "ので", "ものの") and "接続助詞" in pos:
            # ものの (tranche 6): the concessive attaches only to
            # 用言/助動詞 (した+ものの) — the PARTICLE_CONJ_V discipline
            # keeps the genitive もの+の (ものの値段) winning after
            # BOS/nouns/particles, where the 接続助詞 is blocked.
            return (PARTICLE_CONJ_V, PARTICLE)
        if surface == "わ" and "終助詞" in pos:
            # わ: な's terminal-only profile MINUS the soft-imperative
            # 連用形 openings (see PARTICLE_WA).
            return (PARTICLE_WA, PARTICLE_NA)
        if surface in ("な", "かな") and "終助詞" in pos:
            # かな shares な's terminal-only attachment (いい+かな) — as a
            # generic particle its 100-cost row stole かなしさ's first two
            # chars from the ガル stem (round-7 さ redesign probes).
            # Right class PARTICLE_NA too: って must stay attachable after
            # 終助詞 な (いいなって) while every other particle+って is
            # blocked (audit 123).
            return (PARTICLE_NA, PARTICLE_NA)
        if surface == "って":
            return (PARTICLE_TTE, PARTICLE)
        # じゃ (では contraction) / じゃん (終助詞): 体言/連体形/助動詞
        # left contexts only — see PARTICLE_JA (round-8 held-out tranche).
        if surface in ("じゃ", "じゃん"):
            return (PARTICLE_JA, PARTICLE)
        # でも 副助詞 (誰にでも): see PARTICLE_DEMO — the 接続詞 でも row
        # keeps its own generic class.
        if surface == "でも" and "副助詞" in pos:
            return (PARTICLE_DEMO, PARTICLE)
        # だり — たり's voiced 並立助詞 twin (IPADIC: 飲んだり, やんだり):
        # attaches exactly where だ does (voiced 撥音便/ガ行イ音便 stems,
        # with だ's reward; penalized after plain 連用形 — 食べだり is
        # 食べたり), so it shares AUX_DA's left class; right side is an
        # ordinary particle (round-8 tranche 2, s565/s566).
        if surface == "だり":
            return (AUX_DARI, PARTICLE)
        if surface == "し" and "接続助詞" in pos:
            return (PARTICLE, PARTICLE_SHI)
        c = PARTICLE
    elif top == "助動詞":
        # ない gets its own left class so 未然形→ない can be rewarded
        # without rewarding 未然形 before every auxiliary (which would
        # re-analyze lexicalized causatives — see _RENYO_FORMS note).
        # Right class stays AUX: nothing keys on "after ない".
        # なきゃ (なければ's colloquial contraction, IPADIC 特殊・ナイ
        # paradigm): same attachment sites as なけれ (やら+なきゃ+いけ+
        # ない — round-8 held-out tranche, ho_casual).
        if surface in ("ない", "なかっ", "なけれ", "なきゃ"):
            # なかっ (ない's 連用タ接続) shares ない's attachment sites —
            # 探さ+なかっ+た is the canonical negative past.  It sat in
            # the generic AUX class until the (VERB_CONJ, AUX) block
            # landed and took 未然形+なかった down with さ+ます (caught
            # by the wave-350 probe sweep, not the goldens — now pinned).
            return (AUX_NAI, AUX)
        # なく (ない's 連用テ接続: 来なくなった) — unlike ない it must NOT
        # follow particles/nouns: 鳥がなく must keep the 鳴く verb reading,
        # while ことがない is legal for ない itself.
        if surface == "なく":
            return (AUX_NAKU, AUX)
        if surface == "らし":
            # らしい's ガル接続 form (IPADIC 形容詞・イ段 — the
            # noun+らしさ nominalization: 自分|らし|さ; round 12,
            # audit 162).  Left side reuses SUFFIX_RA: the attachment
            # profile IS noun-only (らしさ follows 体言), and a cheap
            # generic-AUX らし would shred every 〜らし verb 連用形
            # whose row is missing (く+らし undercutting 暮らし).
            # Right side ADJ_GARU so the nominalizer さ (NOUN_SA) and
            # そう attach exactly as after adjective stems.
            return (SUFFIX_RA, ADJ_GARU)
        # う (volitional) and ん (ぬ/の contractions) are single hiragana
        # with cost 100 — cheap enough to shred any hiragana content word
        # (うまい → う+まい, うに → う+に, ませ+ん fine but BOS+ん not).
        # Grammatically う attaches ONLY to 未然ウ接続 forms (行こ+う,
        # 高かろ+う) and auxiliaries (ましょ+う, だろ+う); ん ONLY to
        # 未然形 (行か+ん) and auxiliaries (ませ+ん, た+ん).  Their own
        # left classes + the BLOCK rows below enforce that.
        if surface == "う":
            return (AUX_U, AUX)
        if surface == "よう":
            return (AUX_YOU, AUX)
        # まい (negative volitional): attaches to 終止形 (行く+まい) and
        # auxiliaries (ます+まい) — NEVER a 連用形, where the generic AUX
        # class's −800 reward let て+し+まい outbid て+しまい (しまう's
        # 連用形; round-7 audit 116).  AUX_MAI below blocks the stem
        # contexts.
        if surface == "まい":
            return (AUX_MAI, AUX)
        if surface == "ん":
            return (AUX_N, AUX)
        # Passive/causative morphemes and ぬ attach only to verb stems
        # (未然形 行か+れる; ichidan stems are classed 連用 here, 食べ+
        # られる) — never to nouns/particles/BOS, which is what let the
        # cost-100 れ/せ rows shred hiragana nouns (ほうれんそう →
        # ほう+れ+ん+そう).  たい/たく likewise attach only to 連用形.
        # The STEM forms keep accepting downstream auxiliaries that
        # attach to 連用形-like states (知られ+ず, 行かせ+ぬ, 褒められ+
        # たい): their right class is AUX_VSTEM, which mirrors AUX
        # everywhere except the AUX_VATT/AUX_TAI blocks below.
        if surface in ("れ", "られ", "せ", "させ"):
            return (AUX_VATT, AUX_VSTEM)
        # ざる (ぬ's 連体形: 知られ+ざる, 食わ+ざる) shares their
        # attachment sites; the noun ざる (colander) keeps its own row,
        # so BOS-anchored ざるそば is unaffected.
        if surface in ("れる", "られる", "せる", "させる", "ぬ", "ず",
                       "ざる"):
            return (AUX_VATT, AUX)
        if surface in ("たい", "たく", "たかっ"):
            return (AUX_TAI, AUX)
        # た attaches to 音便 forms (焼い+た, 飲ん+だ via the だ row),
        # ichidan stems (食べ+た) and auxiliaries (まし+た) — but NOT to
        # godan 連用形 (焼きた is not Japanese): that shred is what read
        # 焼きたて as 焼き+た+て (round-6 audit).
        if surface == "た":
            return (AUX_TA, AUX_TA_R)
        # たら/だら — た/だ's 仮定形 rows (IPADIC 特殊・タ/ダ): same
        # attachment sites as their 基本形 twins (行っ+たら, 飲ん+だら,
        # まし+たら), same right-side discipline (たら+continuative-stem
        # is as ungrammatical as た's).
        if surface == "たら":
            # Right side TARA_R (audit 166): た's row minus the
            # 連用形-clause block — see the class declaration.
            return (AUX_TA, TARA_R)
        if surface == "だら":
            return (AUX_DA, AUX)
        if surface in ("です", "でし", "でしょ"):
            return (AUX_COP, AUX)
        # べから (べし's 未然形: 恐れる+べから+ず — tranche 4): left side
        # generic AUX (same sites as べき), right side AUX_VSTEM so the
        # privative ず attaches (the 知られ+ず pattern); the AUX_VATT
        # block keeps every other 未然形-seeking auxiliary off it.
        if surface == "べから":
            return (AUX, AUX_VSTEM)
        # だ's 体言接続 な (round 7, 雨なので): noun-only attachment via
        # its dedicated class (sharing です's AUX_COP left PARTICLE→な
        # open, which let に+な+って outbid に+なっ+て); its RIGHT side
        # accepts nominals/の-particles only (AUX_NA_R — audit 120).
        if surface == "な":
            return (AUX_NA, AUX_NA_R)
        # だ: copula after nouns AND the voiced past auxiliary after
        # ガ/ナ/バ/マ行 音便 (飲ん+だ) — its own left class so plain
        # 連用形+だ can be penalized (見通しだ must read the deverbal
        # noun, wave 345) without touching the 音便 past tense.  だろ/
        # だっ/で stay generic AUX (飲んだろう keeps its reward path).
        if surface == "だ":
            return (AUX_DA, AUX)
        # だっ (だ's 連用タ接続): only た/たら may follow — see AUX_DATT.
        # Left side stays generic AUX (最高だっ+た via NOUN→AUX default).
        if surface == "だっ":
            return (AUX, AUX_DATT)
        c = AUX
    elif top in ("動詞", "形容詞"):
        if cform is not None:
            if (
                cform == "連用タ接続"
                and top == "動詞"
                and ctype is not None
                and ctype.startswith(("五段・ガ行", "五段・ナ行",
                                      "五段・バ行", "五段・マ行"))
            ):
                # Voiced 音便 (飲ん, 死ん, 遊ん, 泳い): the only stems
                # whose past auxiliary is だ, and た never follows them.
                kind = "cont_da"
            elif cform == "連用タ接続" and top == "動詞":
                # Unvoiced 音便 (行っ, 買っ, 書い): only た/て/たり attach
                # — see VERB_ONBIN.
                kind = "onbin"
            elif cform in _RENYO_FORMS:
                # Godan 連用形 (焼き) is its own attachment state: ます/
                # たい attach, た/ない/れる do not (those take 音便 or
                # 未然形).  Ichidan stems and 音便 rows stay fully
                # permissive VERB_CONT.  サ行 is the exception among
                # godan rows: it has NO 音便, so 話し+た / うつし+た ARE
                # the correct past-tense bigrams — サ行 連用形 stays
                # VERB_CONT (round-6 bug: the blanket 五段 check broke
                # うつした/わたした for snapshot-only サ行 verbs; the
                # hand lexicon's cform-less rows masked it for 話す).
                if (
                    cform == "連用形"
                    and ctype is not None
                    and ctype.startswith("五段")
                    and not ctype.startswith("五段・サ行")
                    and top == "動詞"
                ):
                    kind = "ren"
                else:
                    kind = "cont"
            elif cform == "命令ｉ":
                # ラ行特殊 imperative-cum-マス接続 stem (ください/なさい):
                # ます/ませ attach, た/ない do not — the godan 連用形
                # profile (see _OTHER_CONJ_FORMS note).
                kind = "ren"
            elif cform in _MIZEN_U_FORMS:
                kind = "conj_u"
            elif cform == "ガル接続" and top == "形容詞":
                # The さ/そう/がる attachment stem — its own class so the
                # 接尾 さ row can name it (verbs have no ガル接続 row).
                kind = "garu"
            elif cform in _OTHER_CONJ_FORMS:
                kind = "conj"
            else:
                kind = "base"  # 基本形 and anything unrecognized
        else:
            # No conjugation-form data (hand-built lexicon 5-tuples): a
            # row whose base_form differs from its surface is conjugated,
            # and the lexicon's conjugated surfaces are predominantly
            # 連用/タ接続 forms — treat as continuative.  The voiced 音便
            # half is recoverable from the surface alone: no 連用形 ends
            # in ん (死ぬ's is 死に), so surface-final ん IS ガ/ナ/バ/マ行
            # 撥音便; surface-final い with a ぐ base is ガ行 イ音便
            # (泳い).  Keeps lexicon-only verbs' 〜んだ past working
            # under the (VERB_CONT, AUX_DA) penalty below.
            if base_form is not None and base_form != surface:
                if top == "動詞" and (surface, base_form) in _IRREGULAR_MIZEN_U:
                    kind = "conj_u"
                elif top == "動詞" and (surface, base_form) in _IRREGULAR_CONJ:
                    kind = "conj"
                elif top == "動詞" and (surface, base_form) in _IRREGULAR_MIZEN:
                    # サ変 未然形 stems さ/せ (される, させる sites): the
                    # blanket treat-as-continuative fallback handed them
                    # the 連用形→助動詞 reward, which is what let hiragana
                    # さます (冷ます) shred into さ(する)+ます.
                    kind = "conj"
                elif top == "動詞" and (
                    surface.endswith("ん")
                    or (surface.endswith("い") and base_form.endswith("ぐ"))
                ):
                    kind = "cont_da"
                elif top == "動詞" and (
                    surface.endswith("っ")
                    or (surface.endswith("い") and base_form.endswith("く"))
                ):
                    # Unvoiced 音便 recoverable from the surface alone:
                    # no 連用形 ends in っ, and a く-base い-final surface
                    # is カ行 イ音便 (書い) — see VERB_ONBIN.
                    kind = "onbin"
                else:
                    kind = "cont"
            else:
                kind = "base"
        if top == "動詞":
            c = {"cont": VERB_CONT, "cont_da": VERB_CONT_DA,
                 "onbin": VERB_ONBIN,
                 "ren": VERB_CONT_REN, "conj": VERB_CONJ,
                 "conj_u": VERB_CONJ_U, "base": VERB_BASE}[kind]
        else:
            c = {"cont": ADJ_CONT, "conj": ADJ_CONJ, "garu": ADJ_GARU,
                 "conj_u": ADJ_CONJ_U, "base": ADJ_BASE}[kind]
    else:
        c = DEFAULT
    if (
        cform is None
        and top in ("動詞", "形容詞")
        and base_form is not None
        and base_form != surface
    ):
        # Hand-lexicon conjugated rows: the class came from surface/base
        # INFERENCE, so the (pos, ctype, cform) tuple alone does not
        # determine it — these keep their coarse behavior class.
        return (c, c)
    if ctype == "五段・カ行イ音便" and cform == "未然形" and base_form != "とく":
        # The (VERB_ONBIN → カ行イ音便 未然形) -1000 tuple reward exists
        # solely for the ておく contraction's 未然形 (やっ+とか+ない,
        # s511) — an ordinary ka-gyo verb's 未然形 after an unvoiced 音便
        # stem (やっ+書か, 買っ+聞か) is ungrammatical and must never
        # collect it (ADVICE r8: a -1000 reward on a generally
        # ungrammatical bigram can flip near-ties toward wrong merges).
        # Every row but とく's keeps the coarse group id here, which is
        # how matrix.def would price it: the contraction is a lexicalized
        # row with its own context id, not a property of the conjugation
        # class.
        return (c, c)
    return _tupleize(c, c, pos, ctype, cform)


# The authored matrix: {(prev_right_class, next_left_class): cost}.
# Missing pairs cost 0.  Keep every entry justified in the module doc.
CONNECTION_COSTS: dict[tuple[int, int], int] = {
    (VERB_CONT, AUX): -800,
    (ADJ_CONT, AUX): -800,
    # ない carries the dedicated left class AUX_NAI, so the two rows above
    # must be mirrored for it (食べ+ない, 高く+ない keep their reward).
    (VERB_CONT, AUX_NAI): -800,
    (ADJ_CONT, AUX_NAI): -800,
    # …and for たい/たく/たかっ (AUX_TAI): without the mirror, 会い+たかっ
    # +た (1400) loses to 会い+た+かっ(買う)+た (1000, two rewarded た).
    # Deliberately NOT mirrored for AUX_VATT: rewarding 未然形/連用形
    # before せ/れ re-analyzes lexicalized causatives (済ませて — the
    # _RENYO_FORMS note), and no correct parse needs it.
    (VERB_CONT, AUX_TAI): -800,
    # た (AUX_TA) keeps the canonical reward after its legal sites:
    # 音便/ichidan stems (VERB_CONT: 焼い+た, 食べ+た) and 連用タ接続
    # adjectives (高かっ+た).
    (VERB_CONT, AUX_TA): -800,
    (ADJ_CONT, AUX_TA): -800,
    # Godan 連用形 (VERB_CONT_REN) keeps its legal-attachment rewards:
    # 焼き+ます, 焼き+たい.
    (VERB_CONT_REN, AUX): -800,
    (VERB_CONT_REN, AUX_TAI): -800,
    # 未然形→ない, the canonical negative bigram (IPADIC's matrix rewards
    # it strongly).  Smaller than the 連用 reward, and scoped to ない
    # alone: rewarding 未然形 before EVERY auxiliary re-analyzes
    # lexicalized causatives (済ませて → 済ま+せ+て).  What it pins:
    # 経たない stays 経つ(未然)+ない even though the fused 経た(経る) row
    # is 50 cheaper (tests/test_tokenizer.py, round-6 wave 307).
    (VERB_CONJ, AUX_NAI): -500,
}

# Hard attachment constraints (the matrix.def analog of IPADIC's huge
# costs for ungrammatical context pairs — not a "rare bigram" penalty):
# う may follow only 未然ウ接続 forms (行こ+う, 高かろ+う) and other
# auxiliaries (ましょ+う, だろ+う, ない+ん via AUX_NAI's right class
# AUX); ん may follow only 未然形 (行か+ん — VERB_CONJ) and auxiliaries
# (ませ+ん, 食べた+ん+だ).  Every other left context is grammatically
# impossible and gets BLOCK.  This is what stops the cost-100 う/ん rows
# from shredding hiragana content words from the left edge: うまい →
# う+まい, うたう → う+た+う, うとうと → う+と+う+と, めんどう →
# めんど(ガル接続)+う all collapse to the content/unknown word once the
# illegal contexts are blocked (round-6 self-coverage audit over all
# 59k surfaces).  Unknown-word behavior note: a BLOCKed pair can flip a
# path onto an unknown-run node (うん → one unknown token instead of
# う+ん) — that direction is the correct one here and is golden-pinned.
BLOCK = 10000
for _left in (DEFAULT, BOS, NOUN, PARTICLE, VERB_BASE, VERB_CONT,
              VERB_CONJ, ADJ_BASE, ADJ_CONT, ADJ_CONJ):
    CONNECTION_COSTS[(_left, AUX_U)] = BLOCK
for _left in (DEFAULT, BOS, NOUN, PARTICLE, VERB_BASE, VERB_CONT,
              VERB_CONJ_U, ADJ_BASE, ADJ_CONT, ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, AUX_N)] = BLOCK
# れ/せ/られ/…/ぬ (AUX_VATT): legal after 未然形 (VERB_CONJ) and ichidan
# stems (VERB_CONT); たい/たく (AUX_TAI): legal after 連用形 only.
for _left in (DEFAULT, BOS, NOUN, PARTICLE, AUX, VERB_BASE, VERB_CONJ_U,
              ADJ_BASE, ADJ_CONT, ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, AUX_VATT)] = BLOCK
for _left in (DEFAULT, BOS, NOUN, PARTICLE, AUX, VERB_BASE, VERB_CONJ,
              VERB_CONJ_U, ADJ_BASE, ADJ_CONT, ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, AUX_TAI)] = BLOCK
# Godan 連用形 cannot take た/ない/passive-causative morphemes (焼きた,
# 飲みない, 読みれる are not Japanese — those attach to 音便/未然形), and
# た cannot follow it.  This closes the 焼きたて → 焼き+た+て shred class
# (round-6 audit) while 焼き+ます / 焼き+たい keep their rewards above.
# (ADJ_CONT is NOT in た's block list: it covers 連用タ接続 — 高かっ+た
# is the canonical adjective past and keeps its -800 reward above.)
for _left in (DEFAULT, BOS, NOUN, PARTICLE, VERB_BASE, VERB_CONJ,
              VERB_CONJ_U, ADJ_BASE, ADJ_CONJ, ADJ_CONJ_U,
              VERB_CONT_REN):
    CONNECTION_COSTS[(_left, AUX_TA)] = BLOCK
CONNECTION_COSTS[(VERB_CONT_REN, AUX_NAI)] = BLOCK
CONNECTION_COSTS[(VERB_CONT_REN, AUX_VATT)] = BLOCK
for _left in (VERB_CONT_REN,):
    CONNECTION_COSTS[(_left, AUX_U)] = BLOCK
    CONNECTION_COSTS[(_left, AUX_N)] = BLOCK
# です/でし/でしょ (AUX_COP): ungrammatical directly after verb 連用形
# (×行きです, ×通りです — IPADIC's matrix prices these out), which is
# what let the 連用形→助動詞 reward pull 通り(動詞)+です under the
# deverbal noun 通り.  Legal after nouns/particles/base forms/aux
# (の+です, 高い+です, まし+…) — those stay at the sparse default.
for _left in (VERB_CONT, VERB_CONT_REN, ADJ_CONT):
    CONNECTION_COSTS[(_left, AUX_COP)] = BLOCK
# 連用形 + を/が/の: ungrammatical — +200 tips ties toward an existing
# deverbal-noun row (占い+を over 占う連用+を) without ever stranding
# inputs that have no noun alternative.
for _left in (VERB_CONT, VERB_CONT_REN):
    CONNECTION_COSTS[(_left, PARTICLE_CASE)] = 200
# Adjective 連用形 + を/が/の is equally ungrammatical (×高くの) — the
# same tip lets the IPADIC 副詞可能 nouns 近く/多く/遠く win their
# nominal contexts (近くの店, 多くの人) while 〜くなる/〜くて contexts
# keep the adjective via the plain tie (the hand lexicon's adjective rows
# register first).  MeCab-parity note: 近くに/遠くから stay lemma 近い/
# 遠い here (IPADIC reads the noun) — surface segmentation is identical,
# and に/から must stay penalty-free for 買いに行く/てから.
CONNECTION_COSTS[(ADJ_CONT, PARTICLE_CASE)] = 200
# 名詞 + conjunctive て/で: ungrammatical (te-forms attach to 連用/音便
# stems) — the mirror tip, so an ichidan stem tied with its wave-349
# deverbal noun (群れ/眺め/仕掛け at 1200 both ways) keeps て-contexts
# verb-side (群れ+て+いる lemmatizes 群れる) while を/が/の contexts stay
# noun-side via the row above.  Penalty not BLOCK, same rationale.
CONNECTION_COSTS[(NOUN, PARTICLE_TE)] = 200
CONNECTION_COSTS[(NOUN, PARTICLE_DE)] = 200
# 連用形 + て: the canonical te-form bigram (食べ+て, でき+て) — a
# moderate reward so the fused カ変 row きて (wave 355) can never steal
# でき+て as で+きて (the same guard きた gets from the −800 連用形→
# 助動詞 reward; て is a particle so that reward never applied).  −300,
# not −800: it only needs to clear て's 50-cost plus the fused row's
# −50 discount with margin, and a smaller reward reorders fewer distant
# ties.  ONBIN/音便 stems take て at the sparse default already (行っ+て
# has no competing fused row).
CONNECTION_COSTS[(VERB_CONT, PARTICLE_TE)] = -300
# Right-context → EOS costs (matrix.def's BOS/EOS column analog).
# Sentences do not END in a verb 連用形 — 連用中止 always continues —
# so a trailing deverbal noun (晴れのち曇り, 会議の終わり) wins the
# final position instead of tying into the verb reading.  +200 only
# reorders ties/near-ties: with no noun alternative the verb parse
# still ends the sentence (fragments like さあ行こ keep parsing).
EOS_COSTS: dict[int, int] = {
    VERB_CONT: 200, VERB_CONT_REN: 200, VERB_CONT_DA: 200,
    VERB_ONBIN: 200,
}
# Round 7: sentences never END in a 接頭詞 or a 未然(ウ)接続 form either
# (matrix.def's EOS column prices these out hard).  This is what stops
# the cost-800 お/ご prefix rows from stealing word-FINAL お/ご (はしご
# → は+し+ご, しお → し+お) and the 未然ウ rows from winning isolation
# parses (かお → か+お would otherwise tie 買おう's stem row) — while
# mid-sentence keigo (を+お+かけ+し+て) pays nothing.  命令形 shares
# VERB_CONJ and CAN end a sentence (行け！) — +500 is a penalty, not a
# block, so a fragment with no alternative still parses.
EOS_COSTS[PREFIX] = 800
# Passive/causative stems (れ/られ/せ/させ) never end a sentence either —
# same tier as the 連用形 EOS rows above (audit 120: 知ら+せ at EOS was
# undercutting noun readings because the stems carried no EOS cost).
EOS_COSTS[AUX_VSTEM] = 200
# VERB_CONJ(_U) deliberately carry NO EOS penalty: taxing them taxed
# every isolated conjugated surface (self-coverage audit exploded 240 →
# 3000+ because 未然ウ rows exist for every verb), 命令形 really does
# end sentences — and the PREFIX EOS row alone already settles the
# isolation ties it was meant for (かお: か+お pays 50+800+800 > the
# 1200 stem row).

# だ (AUX_DA) — the voiced 音便 split (wave 345).  Legal sites: nouns/
# particles/auxiliaries (copula/のだ — sparse default 0) and voiced
# 音便 stems (past tense, rewarded like every canonical 活用+助動詞
# bigram).  After a plain 連用形 it is ungrammatical (×見通しだ as
# 見通す+だ, ×頼みだ as 頼む+だ) — a +1000 PENALTY, not BLOCK, so a
# voiced-音便 row that ever slips through the cont_da classification
# (or a future cform-less ingest) degrades to a worse score instead of
# losing its past tense outright.
CONNECTION_COSTS[(VERB_CONT_DA, AUX_DA)] = -800
CONNECTION_COSTS[(VERB_CONT, AUX_DA)] = 1000
CONNECTION_COSTS[(VERB_CONT_REN, AUX_DA)] = 1000
CONNECTION_COSTS[(ADJ_CONT, AUX_DA)] = 1000
# Voiced 音便 stems mirror VERB_CONT's generic-aux reward (飲ん+だろ+う
# keeps the path it had when these rows were VERB_CONT), and inherit
# its EOS/case-particle treatment above; but the unvoiced-only
# auxiliaries can never follow them (×飲んた, ×飲んたい, ×飲んない,
# ×飲んれる, ×飲んです — those attach to 連用形/未然形, which ガ/ナ/
# バ/マ行 verbs reach via 飲み/飲ま instead).
CONNECTION_COSTS[(VERB_CONT_DA, AUX)] = -800
CONNECTION_COSTS[(VERB_CONT_DA, PARTICLE_CASE)] = 200
for _next in (AUX_TA, AUX_TAI, AUX_VATT, AUX_NAI, AUX_NAKU,
              AUX_U, AUX_N, AUX_COP):
    CONNECTION_COSTS[(VERB_CONT_DA, _next)] = BLOCK

# Unvoiced 音便 stems (VERB_ONBIN): た keeps the canonical reward
# (行っ+た, 書い+た); て/たり are particles at the sparse default
# (行っ+て, 買っ+たり); EVERYTHING else auxiliary is ungrammatical —
# ×持ったい, ×書います, ×買っない, ×行っれる, ×聞いです all attach to
# 連用形/未然形 instead.  This is the unvoiced mirror of the
# VERB_CONT_DA block above, and what keeps もったいない whole.
CONNECTION_COSTS[(VERB_ONBIN, AUX_TA)] = -800
CONNECTION_COSTS[(VERB_ONBIN, PARTICLE_CASE)] = 200
for _next in (AUX, AUX_DA, AUX_TAI, AUX_VATT, AUX_NAI, AUX_NAKU,
              AUX_U, AUX_N, AUX_COP):
    CONNECTION_COSTS[(VERB_ONBIN, _next)] = BLOCK

# 未然形 + generic auxiliary is ungrammatical across the board: every
# auxiliary that CAN follow 未然形 has its own left class (ない/なく/ん/
# う/れる-family), and the generic residue (ます/まし/です/だろ/べき/
# まい/よう/らしい…) attaches to 連用形 or 基本形 instead — ×さ+ます,
# ×わか+まし.  This is what let hiragana さます (冷ます) shred into
# する未然+ます (self-coverage audit).
CONNECTION_COSTS[(VERB_CONJ, AUX)] = BLOCK
# …and 未然形 + VERB is equally ungrammatical (round 7): おかけしました
# read おか(おく未然)+けし(消す連用)+まし through the 連用形→助動詞
# reward until this block.  Verb-verb continuation goes through 連用形/
# て-forms, never 未然形.  (ADJ classes NOT included: ガル接続 stems
# share ADJ_CONJ and legitimately take verbs — 面白+すぎる.)
for _next in (VERB_BASE, VERB_CONT, VERB_CONT_REN, VERB_CONT_DA,
              VERB_ONBIN, VERB_CONJ, VERB_CONJ_U):
    CONNECTION_COSTS[(VERB_CONJ, _next)] = BLOCK
# た + continuative verb stem (AUX_TA_R is た's right class): 連体形 た
# modifies nouns (行った人), and verb-verb continuation goes through て —
# ×もっ+た+い(いる)+ない, the reroute that kept shredding もったいない
# after the ONBIN blocks above.  た+ん (食べたんだ) stays legal: AUX_TA_R
# is deliberately NOT in ん's block list.
CONNECTION_COSTS[(AUX_TA_R, VERB_CONT)] = BLOCK
# …and た keeps generic AUX's left-side hard constraints (×た+れる,
# ×た+たい) now that its right class is dedicated.
CONNECTION_COSTS[(AUX_TA_R, AUX_VATT)] = BLOCK
CONNECTION_COSTS[(AUX_TA_R, AUX_TAI)] = BLOCK
# た + ない is ungrammatical (negative past is なかった) — without this
# the new single-char カ変 き row (round 7) would shred きたない into
# き+た+ない (600 after rewards, vs the adjective's 1200).
CONNECTION_COSTS[(AUX_TA_R, AUX_NAI)] = BLOCK

# のに/ので (PARTICLE_CONJ_V): legal ONLY after 用言 base forms and
# auxiliaries (行く+ので, 安い+のに, 行っ+たら…は AUX side, ます+ので,
# 行った+ので via AUX_TA_R).  Everything nominal/particle-side is blocked
# — that is exactly the split MeCab's matrix enforces, and it protects
# every genitive の reading (車の+におい, 私の+に) from the new rows.
# 連用形 contexts are blocked too (×行きので — 連用中止 never takes them).
for _left in (DEFAULT, BOS, NOUN, PARTICLE, PARTICLE_CASE, PARTICLE_TE,
              PARTICLE_DE, PARTICLE_CONJ_V, VERB_CONT, VERB_CONT_REN,
              VERB_CONT_DA, VERB_ONBIN, ADJ_CONT, VERB_CONJ, VERB_CONJ_U,
              ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, PARTICLE_CONJ_V)] = BLOCK
# …and in the legal contexts a small reward breaks the exact cost tie
# with the の+に / の+で split (both 100 under the 50·len particle
# formula) the way MeCab's matrix does — deterministically, not by
# relaxation order.
for _left in (VERB_BASE, ADJ_BASE, AUX, AUX_TA_R):
    CONNECTION_COSTS[(_left, PARTICLE_CONJ_V)] = -100

# 終助詞 な (PARTICLE_NA): legal ONLY after terminal forms and
# auxiliaries (行く+な, いい+な+って, だ+な, 行った+な, ない+な) plus the
# Kansai negative 未然形+な (行か+な) — everywhere else the 50-cost な is
# a lattice thief: に+な+って and 寒く+な+って outbid the 1200-cost なっ
# row, and noun+な is the 助動詞's context (AUX_NA), not the 終助詞's.
# The one legal particle+な fusion, かな, is its own IPADIC row.
for _left in (DEFAULT, BOS, NOUN, PARTICLE, VERB_CONT, VERB_CONT_REN,
              VERB_CONT_DA, VERB_ONBIN, ADJ_CONT, VERB_CONJ_U,
              ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, PARTICLE_NA)] = BLOCK

# よう (AUX_YOU): blocked after every continuative/conjugated stem — the
# volitional goes through the dedicated 未然ウ接続 rows (食べよ+う), and
# 連用形+よう is never IPADIC's parse.  Base forms, nouns (仕事のよう via
# PARTICLE), た (行ったよう), ない/ます etc. keep the sparse default.
for _left in (VERB_CONT, VERB_CONT_REN, VERB_CONT_DA, VERB_ONBIN,
              VERB_CONJ, VERB_CONJ_U, ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, AUX_YOU)] = BLOCK

# 助動詞 な (AUX_NA): 体言接続 means exactly that — block every left
# context except NOUN/NOUN_KD.  Unknown runs (class DEFAULT) are blocked
# too: boundary-wise the な token still stands alone (script switch ends
# the run), so コロナ+な keeps its spans and only pays the degraded cost.
for _left in range(N_CLASSES):
    if _left not in (NOUN, NOUN_KD):
        CONNECTION_COSTS[(_left, AUX_NA)] = BLOCK
# …and the 形容動詞語幹+な reward itself (audit 120: the 300-cost 接続詞
# なお stole な+お in 大事なお知らせ — IPADIC's matrix makes 語幹+な
# nearly free).  −800 like the other canonical 活用+助動詞 rewards;
# −600 left 大事+な+お+知らせ in an exact registration-order tie with
# 大事+なお+知らせ.
CONNECTION_COSTS[(NOUN_KD, AUX_NA)] = -800

# 未然ウ接続 rows exist for exactly one successor: う (行こ+う,
# 高かろ+う).  Anything else after them is ungrammatical, and the
# cheap hiragana rows steal real text without this (ご清栄のこと read
# の+のこ(退く未然ウ)+と, audit 89).  BLOCK every next class except
# AUX_U; sentence-final 行こ! still parses — EOS adds no connection.
for _next in range(N_CLASSES):
    if _next == AUX_U:
        continue
    CONNECTION_COSTS[(VERB_CONJ_U, _next)] = BLOCK
    CONNECTION_COSTS[(ADJ_CONJ_U, _next)] = BLOCK
# なく (AUX_NAKU): legal after 未然形/ichidan stems/連用 adjectives/aux
# (行か+なく, 食べ+なく, 高く+なく, 行きたく+なく) with the mirrored
# rewards; blocked after particles/nouns/BOS so 鳥がなく keeps 鳴く.
CONNECTION_COSTS[(VERB_CONT, AUX_NAKU)] = -800
CONNECTION_COSTS[(ADJ_CONT, AUX_NAKU)] = -800
CONNECTION_COSTS[(VERB_CONJ, AUX_NAKU)] = -500
# NOUN deliberately NOT in なく's block list (wave 333): 問題なく/
# 遅滞なく/事故なく — noun+なく is the frequent 〜なく pattern, and the
# 鳴く protection only needs the PARTICLE block (鳥が+なく).
for _left in (DEFAULT, BOS, PARTICLE, VERB_BASE, VERB_CONJ_U,
              ADJ_BASE, ADJ_CONJ, ADJ_CONJ_U, VERB_CONT_REN):
    CONNECTION_COSTS[(_left, AUX_NAKU)] = BLOCK

# 接頭詞 (PREFIX right class): successors are nominals (ご+連絡, お+茶),
# adjectives (お+忙しい, お+早く), deverbal/連用 stems (お+待ち, お+かけ,
# お+送り) and unknown runs (DEFAULT: novel nouns).  Everything
# functional — particles, auxiliaries, terminal verb forms — is blocked,
# which is what keeps the cost-800 single-kana rows out of hiragana
# function-word territory (おは…, ごと… sequences).
for _next in range(N_CLASSES):
    if _next not in (NOUN, DEFAULT, ADJ_BASE, ADJ_CONT,
                     VERB_CONT, VERB_CONT_REN):
        CONNECTION_COSTS[(PREFIX, _next)] = BLOCK

# し (PARTICLE_SHI right class) — LAST, after every (PARTICLE, y) rule is
# registered: mirror them all so し's right side behaves like any
# particle, then close the one gap the dedicated class exists for —
# し+よう (see the class comment).
for (_l, _r), _c in list(CONNECTION_COSTS.items()):
    if _l == PARTICLE:
        CONNECTION_COSTS.setdefault((PARTICLE_SHI, _r), _c)
CONNECTION_COSTS[(PARTICLE_SHI, AUX_YOU)] = BLOCK

# NOUN_KD mirrors every (NOUN, y) rule (形容動詞語幹 rows are nouns on
# their left AND — apart from the な reward above — on their right:
# 静か+で, 便利+だ keep noun behavior).
for (_l, _r), _c in list(CONNECTION_COSTS.items()):
    if _l == NOUN:
        CONNECTION_COSTS.setdefault((NOUN_KD, _r), _c)

# 終助詞 な's right side mirrors generic PARTICLE (same rationale as
# PARTICLE_SHI's mirror above) …
for (_l, _r), _c in list(CONNECTION_COSTS.items()):
    if _l == PARTICLE:
        CONNECTION_COSTS.setdefault((PARTICLE_NA, _r), _c)
# … and って (PARTICLE_TTE) is blocked after every particle class EXCEPT
# 終助詞 な — closing the particle+って thief for や/と/か/の while
# いいなって stays legal (see the class comment).
for _left in (PARTICLE, PARTICLE_SHI, VERB_CONT, VERB_CONT_REN,
              VERB_CONJ, VERB_CONJ_U, ADJ_CONJ, ADJ_CONJ_U, ADJ_GARU,
              PREFIX, BOS):
    CONNECTION_COSTS[(_left, PARTICLE_TTE)] = BLOCK
# noun+って stays legal (quotative 東京って人) but at a penalty: a bare
# suffix noun + って was outbidding 促音便+て (風車が回+って vs 回っ+て,
# audit 124) — +300 retips toward the verb where one exists and leaves
# quotatives (no competing path) untouched.
CONNECTION_COSTS[(NOUN, PARTICLE_TTE)] = 300
CONNECTION_COSTS[(NOUN_KD, PARTICLE_TTE)] = 300

# ADJ_GARU mirrors every ADJ_CONJ rule on both sides (ガル接続 stems
# carried those blocks before the split — 面白+う must stay blocked, the
# めんどう guard), then opens the one pair the class exists for: stem+さ.
for (_l, _r), _c in list(CONNECTION_COSTS.items()):
    if _l == ADJ_CONJ:
        CONNECTION_COSTS.setdefault((ADJ_GARU, _r), _c)
    if _r == ADJ_CONJ:
        CONNECTION_COSTS.setdefault((_l, ADJ_GARU), _c)
for _left in range(N_CLASSES):
    if _left not in (ADJ_GARU, NOUN, NOUN_KD):
        CONNECTION_COSTS[(_left, NOUN_SA)] = BLOCK
for _left in range(N_CLASSES):
    if _left not in (ADJ_GARU, VERB_CONT, VERB_CONT_REN, NOUN_KD):
        CONNECTION_COSTS[(_left, NOUN_SOU)] = BLOCK
# NOUN_KD in そう's allowlist: 元気+そう, 丈夫+そう — 形容動詞語幹 is a
# legal そうだ attachment site.
for _left in range(N_CLASSES):
    if _left not in (VERB_BASE, AUX, AUX_TA_R):
        CONNECTION_COSTS[(_left, AUX_MAI)] = BLOCK

# 助動詞 な's successors (AUX_NA_R): nominals, unknown runs, and the
# の-family particles — everything auxiliary/verbal is ungrammatical
# after the 体言接続 form (×な+た, ×な+ます, ×な+だ).
for _next in range(N_CLASSES):
    if _next not in (NOUN, NOUN_KD, DEFAULT, PARTICLE, PARTICLE_CONJ_V,
                     PARTICLE_CASE, NOUN_SA, NOUN_SOU, PREFIX):
        CONNECTION_COSTS[(AUX_NA_R, _next)] = BLOCK
# …except unknown runs, at a penalty: 1-char kanji ガル stems (高, 安)
# are length-filtered out of the dictionary, and katakana stems (コワ
# そう) are open-class — their そう must attach through the unknown node
# (高(5200)+そう beats the そうな unknown merge), while the penalty keeps
# 副詞+そう and other DEFAULT-class bigrams from abusing the cheap row.
CONNECTION_COSTS[(DEFAULT, NOUN_SOU)] = 600

# --- Round-8 held-out-tranche rows (honest pre-fix F1 0.9795; each rule
# below closes a measured ho_* failure and is re-judged by the full
# 355-sentence corpus + goldens + oracle sweep) -----------------------------
# じゃ/じゃん (PARTICLE_JA): legal after 体言/連体形/助動詞 only.
for _left in range(N_CLASSES):
    if _left not in (NOUN, NOUN_KD, NOUN_NOMI, VERB_BASE, ADJ_BASE,
                     AUX, AUX_TA_R):
        CONNECTION_COSTS[(_left, PARTICLE_JA)] = BLOCK
# 準体 ん (NOUN_NOMI): legal after 連体形 contexts — verb/adjective base
# forms, auxiliaries (ない+ん, てる+ん), た (食べた+ん), and 連体詞/
# unknown runs (そんな+ん — 連体詞 rows are DEFAULT class).  Everything
# else blocked: the 1-char row must never shred hiragana words (same
# discipline as 助動詞 ん's AUX_N).
for _left in range(N_CLASSES):
    if _left not in (VERB_BASE, ADJ_BASE, AUX, AUX_TA_R, DEFAULT):
        CONNECTION_COSTS[(_left, NOUN_NOMI)] = BLOCK
# だっ (AUX_DATT right side): only た/たら (AUX_TA) may follow — IPADIC's
# 連用タ接続 successors.  だ+って keeps its quotative reading (s509).
for _next in range(N_CLASSES):
    if _next != AUX_TA:
        CONNECTION_COSTS[(AUX_DATT, _next)] = BLOCK
# し (PARTICLE_SHI) + particle: ungrammatical — し ends a coordinated
# clause, and the one genuine fusion (しか 副助詞) is its own IPADIC row
# (ho_num s432/s454: 5日しか was shredding into し+か because the two
# 50-cost rows undercut the 400-cost しか; the penalty re-prices the
# shred without touching し+noun / し+punctuation contexts).
CONNECTION_COSTS[(PARTICLE_SHI, PARTICLE)] = 500
# 連用形 + 連用形 verb chaining: IPADIC's matrix disfavors bare 連用+連用
# (compound verbs are lexicalized rows) — without the penalty 出(出る
# 連用)+発し(発する連用) outbids the サ変 reading 出発+し+た by 300
# (ho_ne s409).  +400 reorders only paths where a lexicalized or サ変
# alternative exists; a genuine 連用中止 chain with no alternative still
# parses (penalty, not BLOCK).
CONNECTION_COSTS[(VERB_CONT, VERB_CONT)] = 400
# 終助詞 な after 連用形 — the soft imperative (行き+な, 持ってき+な,
# 寝+な): IPADIC allows it and the held-out tranche measured the gap
# (s514/s516).  Opened for VERB_CONT/VERB_CONT_REN only; the なって
# thieves the block was built for came from PARTICLE/ADJ_CONT lefts,
# which stay blocked.
del CONNECTION_COSTS[(VERB_CONT, PARTICLE_NA)]
del CONNECTION_COSTS[(VERB_CONT_REN, PARTICLE_NA)]
# --- Tranche-2 rows (pre-fix F1 0.9896 over 415 sentences) ----------------
# でも 副助詞 (PARTICLE_DEMO): 体言 contexts here; the 格助詞 lefts
# (誰に+でも) open through a TUPLE override below — the coarse PARTICLE
# class cannot distinguish に from the te-form て, and opening all of it
# would merge every 飲ん+で+も.
for _left in range(N_CLASSES):
    if _left not in (NOUN, NOUN_KD, NOUN_NOMI, VERB_BASE, ADJ_BASE,
                     AUX_TA_R):
        CONNECTION_COSTS[(_left, PARTICLE_DEMO)] = BLOCK
# noun+でも is OPEN (tranche 5 revision): the tranche-2 +100 penalty
# here cited round-1's unannotated 電話+で+も pin (s319) as "MeCab
# picks the split after nouns" — but that pin was itself the error
# (IPADIC's 副助詞 でも row IS the "also by phone" reading; s319 was
# corrected by documented argument alongside s839 誰でも).  The でも
# row's 95 cost beats で(50)+も(50) by exactly 5 — as expensive as
# possible while winning — and the te-form 飲ん+で+も stays safe via
# the BLOCK profile above, not via pricing.
# 連用形 + 終止形 verb: same ungrammatical chaining as 連用+連用 (出+
# 発する outbid 出発+する in 出発するにあたって, s571) — compound verbs
# are lexicalized rows; a genuine 連用中止 before a new clause crosses
# punctuation, never butts directly.
CONNECTION_COSTS[(VERB_CONT, VERB_BASE)] = 400
# Particle + 未然形: grammatical but dispreferred exactly enough that a
# lexicalized alternative wins — ずには+い+られ (s547) was losing by 50
# to ずに+はいら(這入る kana twin)+れ; IPADIC has no hiragana はいる row
# so MeCab never faces the tie, and its matrix prices particle+未然
# above particle+体言 anyway.  +100 reorders only near-ties: 気に入らな
# い keeps 入ら (its only path), 本を+読ま+ない unchanged (no competitor).
CONNECTION_COSTS[(PARTICLE, VERB_CONJ)] = 100
# わ (PARTICLE_WA): な's block profile plus the 連用形 stems な opened,
# plus every particle class (the PARTICLE_SHI mirror runs earlier and
# cannot see this row — し+わ was still shredding しわ through it) —
# 終助詞 わ follows terminal forms/auxiliaries only (知らん+わ, 行く+わ).
for _left in (DEFAULT, BOS, NOUN, PARTICLE, PARTICLE_SHI, PARTICLE_CASE,
              PARTICLE_TE, PARTICLE_DE, PARTICLE_NA, VERB_CONT,
              VERB_CONT_REN, VERB_CONT_DA, VERB_ONBIN, ADJ_CONT,
              VERB_CONJ_U, ADJ_CONJ, ADJ_CONJ_U):
    CONNECTION_COSTS[(_left, PARTICLE_WA)] = BLOCK
# だり (AUX_DARI): voiced 音便 stems ONLY, with だ's past-tense reward
# (やん+だり) — everything else blocked (ね+だり must never shred ねだり).
for _left in range(N_CLASSES):
    if _left != VERB_CONT_DA:
        CONNECTION_COSTS[(_left, AUX_DARI)] = BLOCK
CONNECTION_COSTS[(VERB_CONT_DA, AUX_DARI)] = -800
# 音便 stem + カ行イ音便 未然形: the ておく contraction family attaches
# とく's 未然形 directly to 音便 stems (やっ+とか+ない — IPADIC carries
# とく as an ordinary verb and its matrix rewards the bigram).  Without
# the reward the 副詞 やっと + か shred (1150) undercuts やっ+とか+ない
# (2000) — ho_casual s511.  Authored as a TUPLE override (see the
# mechanical-class section at module bottom): the reward targets exactly
# the (動詞-自立, 五段・カ行イ音便, 未然形) rows instead of every
# VERB_CONJ — matrix.def granularity where the coarse class would have
# rewarded all 未然/仮定/命令 rows after every 音便 stem.
# 連用形 + quotative って: quoting a polite imperative is real grammar
# (寝なさい+って, ご覧なさい+って — なさい is classed REN for its マス
# attachment), and the original thief this block closed came from
# particle lefts (や+って), which stay blocked — ho_casual s520.
del CONNECTION_COSTS[(VERB_CONT_REN, PARTICLE_TTE)]

# Sentences do not START with case/conjunctive particles or bare
# auxiliaries — IPADIC's BOS row prices them out, and without the
# penalty the 50-100-cost rows tie or undercut dictionary words
# char-for-char (かなしさ read か+なし+さ; sentence-initial だから/でも
# read だ+から/で+も instead of their 接続詞 rows).  +400 only reorders
# ties/near-ties: a genuine particle/aux-initial fragment (ですので…)
# still parses when nothing cheaper competes.
for _next in (PARTICLE, PARTICLE_CASE, PARTICLE_TE, PARTICLE_DE, AUX,
              AUX_DA, AUX_COP):
    CONNECTION_COSTS[(BOS, _next)] = 400

# COUNTER_TSU (round 12): the counter つ loses everywhere by +800 —
# blanket over every coarse left so no attachment context is missed
# (see the class declaration for the thief contexts this closes).  The
# one legal left, NUM_UNK, is carved out right after the row copy below.
for _left in range(N_CLASSES):
    if _left != NUM_UNK:
        CONNECTION_COSTS[(_left, COUNTER_TSU)] = 800

# SUFFIX_RA (round 12, audit 161): the suffix ら loses everywhere by
# +800 — blanket over every coarse left so no attachment context is
# missed — except after nouns, where the -2700 reward makes noun+ら the
# canonical IPADIC read (margins in the class declaration).  Written
# BEFORE the NUM_UNK row copy below so digit runs inherit the +800
# (3ら is nonsense) the same way they inherit every DEFAULT block.
for _left in range(N_CLASSES):
    if _left != NOUN:
        CONNECTION_COSTS[(_left, SUFFIX_RA)] = 800
CONNECTION_COSTS[(NOUN, SUFFIX_RA)] = -2700

# NUM_UNK (round 12): digit runs behaved as DEFAULT until the counter つ
# landed — copy DEFAULT's complete authored row so that stays true
# verbatim (blocks on bare う/ん/た/ない…, the なく/んで guards), then
# apply the one divergence: the 数→助数詞 reward that makes digit+つ
# the canonical IPADIC read (margins in the COUNTER_TSU declaration).
# Runs AFTER every CONNECTION_COSTS author site above by construction —
# a later DEFAULT-row edit added below this line would silently not
# copy, so keep this block last.
for (_l, _r), _v in list(CONNECTION_COSTS.items()):
    if _l == DEFAULT:
        CONNECTION_COSTS[(NUM_UNK, _r)] = _v
if DEFAULT in EOS_COSTS:  # pragma: no cover — DEFAULT has no EOS cost today
    EOS_COSTS[NUM_UNK] = EOS_COSTS[DEFAULT]
CONNECTION_COSTS[(NUM_UNK, COUNTER_TSU)] = -2700

# TARA_R (round 12, audit 166): copy AUX_TA_R's complete authored row
# so every た-side discipline holds verbatim for たら, then apply the
# one divergence — the conditional's clause boundary admits a 連用形
# opener (margins in the class declaration).  Same last-position
# contract as the NUM_UNK copy above: a later AUX_TA_R edit added
# below this line would silently not copy.
for (_l, _r), _v in list(CONNECTION_COSTS.items()):
    if _l == AUX_TA_R:
        CONNECTION_COSTS[(TARA_R, _r)] = _v
if AUX_TA_R in EOS_COSTS:
    EOS_COSTS[TARA_R] = EOS_COSTS[AUX_TA_R]
CONNECTION_COSTS[(TARA_R, VERB_CONT)] = 200


# --- mechanical tuple-class machinery (fills the tables declared above
# entry_classes; runs LAST so the authored matrix is complete) --------------
from hive_udf_neologd_spark.tokenizer.conn_tuples import TUPLES  # noqa: E402

# 1) Behavior group of every tuple: run the classification itself on the
# bare tuple (surface="", base_form=None) — TUPLE_IDS is still empty, so
# _tupleize is inert and entry_classes returns the coarse pair.  Groups
# are PAIRS: some tuple-determined classes are asymmetric (接頭詞 →
# (DEFAULT, PREFIX), 形容動詞語幹 → (NOUN, NOUN_KD)).
_TUPLE_GROUPS: tuple[tuple[int, int], ...] = tuple(
    entry_classes(_pos, None, "", cform=_cf or None, ctype=_ct or None)
    for (_pos, _ct, _cf) in TUPLES
)

# 2) Ids: N_CLASSES..N_TOTAL-1 in the generated (sorted) tuple order.
TUPLE_IDS.update({t: N_CLASSES + i for i, t in enumerate(TUPLES)})
N_TOTAL = N_CLASSES + len(TUPLES)

# 3) Authored tuple-pair overrides — the matrix.def-granular tier.
# Sparse like CONNECTION_COSTS; any pair not listed inherits the coarse
# cost of its behavior groups.  CHANGING THIS DICT re-canonicalizes
# baked marshal class ids: bump CLASS_SCHEMA_VERSION and regenerate
# (same recapture protocol as entry_classes edits).
_ADN = TUPLE_IDS[("連体詞", "", "")]
_KAGYO_MIZEN = TUPLE_IDS[("動詞-自立", "五段・カ行イ音便", "未然形")]
_KAKU = TUPLE_IDS[("助詞-格助詞-一般", "", "")]
_KEIJO = TUPLE_IDS[("助詞-係助詞", "", "")]
TUPLE_OVERRIDES: dict[tuple[int, int], int] = {
    # 格助詞 (に/で/から — the generic rows; を/が/と carry the surface-
    # scoped PARTICLE_CASE class and never reach the tuple) + でも: open
    # — 誰に+でも, 今から+でも (tranche 2, s557).  The coarse PARTICLE
    # block above keeps て+でも merged-free; this is the granularity the
    # mechanical layer exists for.
    (_KAKU, PARTICLE_DEMO): 0,
    # 係助詞 (は/も/こそ) + 格助詞 (を/が/の/と/へ/まで/より): も+と was
    # undercutting the noun もと by 1400 in をもとに (s572) — the bigram
    # is ungrammatical (係助詞 never feeds a case particle); +800 is a
    # penalty, not a block, so 彼こそが (no competing path) still parses
    # with identical spans.
    (_KEIJO, PARTICLE_CASE): 800,
    # godan 連用形 + 並立助詞 (や/たり): ungrammatical — coordination
    # joins 体言 (や) or attaches to 音便/ichidan stems (焼い+たり,
    # 食べ+たり, both untouched here); the 滑りやすくなって shred rode
    # 滑り+や+すく+な+って through this gap once 滑りやすい was trimmed
    # (s585).  +1200 penalty, not BLOCK: the emphatic 読みやしない
    # pattern survives when nothing competes.
    (VERB_CONT_REN, TUPLE_IDS[("助詞-並立助詞", "", "")]): 1200,
    # godan 連用形 + か (the 副助詞/並立助詞/終助詞 row): か attaches to
    # 終止形/連体形/体言 (行く+か, 雨+か), never to a bare 連用形 — the
    # なり+か+ね(終助詞)+ない shred undercut なり+かね(る)+ない by 300
    # once tranche 3 measured it (s645).  +800 penalty, not BLOCK, so a
    # か with no competing path still parses.  Both 連用形 classes: なり
    # carries a generic VERB_CONT row (hand lexicon) alongside the
    # cform-aware VERB_CONT_REN one, and ichidan stems (見/食べ/かけ)
    # are equally illegal before か.
    (VERB_CONT_REN, TUPLE_IDS[("助詞-副助詞／並立助詞／終助詞", "", "")]): 800,
    (VERB_CONT, TUPLE_IDS[("助詞-副助詞／並立助詞／終助詞", "", "")]): 800,
    # AUX + 連語 (tranche 6): の格助詞連語 rows never attach to plain
    # auxiliaries — う+として stole the volitional quotative う+と+し+て
    # (s852/s856).  +800 penalty, not BLOCK, and the margins are
    # deliberate: として(150)+800 loses to the 50-cost particle path
    # と+し+て (identical spans to MeCab's と+し+て verb read), while
    # という(150)+800 = 950 still BEATS its compositional と+いう(1250)
    # — 行こうという話 keeps the fused row.  た (AUX_TA_R) and 準体 ん
    # (NOUN_NOMI) carry their own right classes, so だった+として and
    # ん+だって are untouched.
    (AUX, TUPLE_IDS[("助詞-格助詞-連語", "", "")]): 800,
    # particle/BOS + 助数詞 (audit 135): counters attach to numbers/
    # nouns, never directly to a particle or the start of text — at the
    # 1500 noun tier the new counter rows still TIED real compounds
    # through free particle/BOS edges (を+発+表し vs を+発表+し;
    # BOS+発+表さ+れる tied 発表+さ+れる).  +800 penalty, not BLOCK:
    # the no-competitor cases (雨の日 — 日 has only its 助数詞 row
    # here) keep parsing, since the unknown alternative is ≥3700
    # dearer; counters with genuine free-noun use (話/曲/席/種/票)
    # carry 名詞-一般 twin rows that the penalty never touches.
    **{(_pl, TUPLE_IDS[("名詞-接尾-助数詞", "", "")]): 800
       for _pl in (BOS, PARTICLE, PARTICLE_CASE, PARTICLE_TE,
                   PARTICLE_DE, _KAKU, _KEIJO)},
    # particle + 接続詞 (tranche-5 follow-up audit): connectives are
    # clause-initial — after 、 (a symbol token) or BOS — never right
    # after a particle, but the 300-cost tier made の+ところで read the
    # fused 接続詞 (先生のところで勉強する).  +800 penalty, not BLOCK.
    **{(_pl, TUPLE_IDS[("接続詞", "", "")]): 800
       for _pl in (PARTICLE, PARTICLE_CASE, PARTICLE_TE, PARTICLE_DE,
                   _KAKU, _KEIJO)},
    # 連体詞 attach to 体言 — particles/auxiliaries after them are
    # ungrammatical (×この+が, ×その+だ).  +600 retires the wave-370
    # cost hack: こんなに/そんなに/あんなに/どんなに now live at the
    # normal 1000 adverb tier because 連体詞(400)+に(50)+600 = 1050
    # no longer undercuts them (they needed 390 before).  Penalty, not
    # BLOCK: a 連体詞+particle with no competing path still parses
    # (こんなの at +600 beats every unknown merge).
    **{(_ADN, _nl): 600
       for _nl in (PARTICLE, PARTICLE_CASE, PARTICLE_TE, PARTICLE_DE,
                   AUX, AUX_DA, AUX_COP)},
    # 音便 stem + とく-family 未然形 (やっ+とか+ない) — see the authored-
    # matrix comment where the coarse (VERB_ONBIN, VERB_CONJ) version of
    # this rule was retired.  Since schema v14, entry_classes hands the
    # _KAGYO_MIZEN id ONLY to base_form とく rows — 書か/聞か/置か stay on
    # their coarse group, so this reward is surface-scoped to the
    # contraction it targets (ADVICE r8).
    (VERB_ONBIN, _KAGYO_MIZEN): -1000,
}
EOS_OVERRIDES: dict[int, int] = {}

# Counter-penalty closure over LIVE particle lefts (round 12): the
# audit-135 +800 above is keyed on the COARSE particle classes, which
# reaches every particle tuple that canonicalizes — but a tuple already
# live-as-left (named as a left by some other override) keeps its own
# rc, falls back to (group_rc, group_lc) = (PARTICLE, NOUN) = 0, and
# skips the penalty entirely (found while probing the counter つ, whose
# first draft shared this tuple and slid in after や for exactly this
# reason; BASELINE.md round 12).  Add the exact pair for every
# ALREADY-live particle-group left — setdefault on already-live ids
# only, so no tuple's canonicalization changes and no other
# coarse-keyed override detaches.
_CNT_LC = TUPLE_IDS[("名詞-接尾-助数詞", "", "")]
for _l in ({l for (l, _r) in TUPLE_OVERRIDES} | set(EOS_OVERRIDES)):
    if _l >= N_CLASSES and _TUPLE_GROUPS[_l - N_CLASSES][1] in (
        PARTICLE, PARTICLE_CASE, PARTICLE_TE, PARTICLE_DE
    ):
        TUPLE_OVERRIDES.setdefault((_l, _CNT_LC), 800)

# 4) Canonicalization: an id is live as a LEFT class only if an override
# names it on the right; live as a RIGHT class only if an override names
# it on the left (or EOS).  Everything else collapses to its group, so
# unoverridden tuples cost nothing at runtime.
_OVR_AS_LEFT = {l for (l, _r) in TUPLE_OVERRIDES} | set(EOS_OVERRIDES)
_OVR_AS_RIGHT = {r for (_l, r) in TUPLE_OVERRIDES}
_CANON_LC.extend(
    (N_CLASSES + i) if (N_CLASSES + i) in _OVR_AS_RIGHT else g[0]
    for i, g in enumerate(_TUPLE_GROUPS)
)
_CANON_RC.extend(
    (N_CLASSES + i) if (N_CLASSES + i) in _OVR_AS_LEFT else g[1]
    for i, g in enumerate(_TUPLE_GROUPS)
)


def _group_lc(i: int) -> int:
    return i if i < N_CLASSES else _TUPLE_GROUPS[i - N_CLASSES][0]


def _group_rc(i: int) -> int:
    return i if i < N_CLASSES else _TUPLE_GROUPS[i - N_CLASSES][1]


def dense_matrix() -> tuple[tuple[int, ...], ...]:
    """N_TOTAL×N_TOTAL dense cost matrix for the Viterbi hot loop:
    tuple-pair overrides first, else the coarse cost of the behavior
    groups.  Rows for non-canonical ids are exact group copies (they are
    never consulted at runtime, but indexing stays branch-free)."""
    return tuple(
        tuple(
            TUPLE_OVERRIDES.get(
                (pr, nl),
                CONNECTION_COSTS.get((_group_rc(pr), _group_lc(nl)), 0),
            )
            for nl in range(N_TOTAL)
        )
        for pr in range(N_TOTAL)
    )


def eos_vector() -> tuple[int, ...]:
    return tuple(
        EOS_OVERRIDES.get(rc, EOS_COSTS.get(_group_rc(rc), 0))
        for rc in range(N_TOTAL)
    )
