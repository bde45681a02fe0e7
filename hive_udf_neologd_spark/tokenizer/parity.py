"""External segmentation-parity corpus + token-span F1 (VERDICT r6 #1).

Every fidelity audit before round 7 was INTERNAL to the engine (self
coverage, unknown-rate on prose the same author wrote the dictionary
against).  This module pins an EXTERNAL metric: a multi-register corpus of
sentences with expected segmentations hand-derived from the behavior the
reference actually embeds — MeCab/IPADIC conjugation conventions plus
NEologd compound/named-entity cohesion (reference ``build.sh:104-159``
clones and compiles mecab-ipadic-neologd; the reference's own goldens,
``KuromojiNEologdUDFTest.java:213-299``, seed the NE register).

Metric: **token-span F1**.  A span is the (start, end) character offsets
of one token in the original sentence (encoded ``start * 1000 + end``;
sentences are far under 1000 chars).  Spans — not boundary positions over
a concatenation — because the tokenizer discards punctuation
(``discardPunctuation=true`` parity), which would shift concatenation
offsets; spans stay anchored to the input.  Punctuation tokens are
excluded from both sides (both sides always agree on them — counting them
would only inflate F1).

    tp     = |pred_spans ∩ expected_spans|  (per sentence, summed)
    precision = tp / n_pred,  recall = tp / n_exp
    micro-F1  = 2·tp / (n_pred + n_exp)

Derivation policy (each non-obvious call annotated inline):

* grammar boundaries follow IPADIC exactly: verb stem at its 活用形 row +
  auxiliaries split (行き/まし/た, 読ん/だ, 食べ/られ/た), い-adjective
  stem+た (高かっ/た), な-adjective + copula (静か/だ), する-nouns split
  (勉強/し/た), all particles free;
* noun compounds: IPADIC split is the baseline; a compound is expected as
  ONE token only when it is a lexicalized NEologd-certain item (named
  entities, established terms with their own dictionary presence —
  annotated ``neologd:``).  Gray-zone compounds are annotated
  ``neologd-may-compound`` and expected as the IPADIC split, so any F1
  loss there is visible and attributable, never silent;
* numbers: an Arabic-digit run is one token (MeCab 名詞-数), counters are
  suffixes (3/月, 10/人).

Recapture protocol (same as tokenizer/goldens.py): a dictionary or matrix
change that legitimately re-segments corpus sentences changes the
RECORDED aggregates ``T22_EXPECTED`` — re-run
``python -m hive_udf_neologd_spark.tokenizer.parity`` and paste the
printed dict HERE (only here); the expected segmentations themselves are
the external contract and are NOT recaptured from the engine (fixing one
requires a documented derivation argument, not an engine run).
"""

from __future__ import annotations

from functools import lru_cache

# --- corpus ----------------------------------------------------------------
# (sid, register, sentence, expected surface tokens — punctuation excluded)
# Spans must appear in order; characters between consecutive tokens must be
# punctuation/whitespace only (validated by tests/test_parity.py).

PARITY_CORPUS: tuple[tuple[int, str, str, tuple[str, ...]], ...] = (
    # ------------------------------------------------------------------ news
    (1, "news", "首相は記者会見で新しい経済政策を発表した。",
     ("首相", "は", "記者会見", "で", "新しい", "経済", "政策", "を",
      "発表", "し", "た")),  # neologd: 記者会見 (Wikipedia-title entry);
                             # 経済政策 kept split — neologd-may-compound
    (2, "news", "政府は来年度の予算案を閣議で決定した。",
     ("政府", "は", "来年度", "の", "予算", "案", "を", "閣議", "で",
      "決定", "し", "た")),  # 予算案: IPADIC 予算+案(名詞-接尾)
    (3, "news", "台風の影響で新幹線の運転が見合わせられている。",
     ("台風", "の", "影響", "で", "新幹線", "の", "運転", "が",
      "見合わせ", "られ", "て", "いる")),
    (4, "news", "警察は事故の原因を詳しく調べています。",
     ("警察", "は", "事故", "の", "原因", "を", "詳しく", "調べ", "て",
      "い", "ます")),
    (5, "news", "株価は前日より大きく値上がりした。",
     ("株価", "は", "前日", "より", "大きく", "値上がり", "し", "た")),
    (6, "news", "会議には各国の代表が出席する予定だ。",
     ("会議", "に", "は", "各国", "の", "代表", "が", "出席", "する",
      "予定", "だ")),
    (7, "news", "新しい制度は四月から導入される。",
     ("新しい", "制度", "は", "四月", "から", "導入", "さ", "れる")),
    (8, "news", "調査の結果が近く公表されるという。",
     ("調査", "の", "結果", "が", "近く", "公表", "さ", "れる",
      "という")),  # という: genuine IPADIC 助詞-格助詞-連語 row
    (9, "news", "大雨による被害が各地で報告されました。",
     ("大雨", "に", "よる", "被害", "が", "各地", "で", "報告", "さ",
      "れ", "まし", "た")),
    (10, "news", "市は住民の避難を呼びかけている。",
     ("市", "は", "住民", "の", "避難", "を", "呼びかけ", "て", "いる")),
    (11, "news", "中央銀行は金利を引き上げると決めた。",
     ("中央銀行", "は", "金利", "を", "引き上げる", "と", "決め", "た")),
     # neologd: 中央銀行 (Wikipedia title)
    (12, "news", "選挙の投票率は過去最低を記録した。",
     ("選挙", "の", "投票率", "は", "過去", "最低", "を", "記録", "し",
      "た")),  # neologd: 投票率 (Wikipedia title)
    (13, "news", "新しい法律が国会で成立した。",
     ("新しい", "法律", "が", "国会", "で", "成立", "し", "た")),
    (14, "news", "消費税の引き上げが議論されている。",
     ("消費税", "の", "引き上げ", "が", "議論", "さ", "れ", "て",
      "いる")),  # neologd: 消費税; 引き上げ deverbal noun
    (15, "news", "地震の発生から時間が経過した。",
     ("地震", "の", "発生", "から", "時間", "が", "経過", "し", "た")),
    (16, "news", "企業の業績は緩やかに回復している。",
     ("企業", "の", "業績", "は", "緩やか", "に", "回復", "し", "て",
      "いる")),
    (17, "news", "旅行に来る人の数が大幅に増えたという。",
     ("旅行", "に", "来る", "人", "の", "数", "が", "大幅", "に", "増え",
      "た", "という")),
    (18, "news", "電力の供給が不足するおそれがある。",
     ("電力", "の", "供給", "が", "不足", "する", "おそれ", "が",
      "ある")),
    (19, "news", "政府は新たな支援策を打ち出した。",
     ("政府", "は", "新た", "な", "支援", "策", "を", "打ち出し", "た")),
     # 支援策: IPADIC split (策 via single-kanji unknown node); 新た+な =
     # 形容動詞語幹 + 助動詞な (AUX_NA)
    (20, "news", "気象庁は大雨に警戒するよう呼びかけた。",
     ("気象庁", "は", "大雨", "に", "警戒", "する", "よう", "呼びかけ",
      "た")),
    # --------------------------------------------------------- conversation
    (31, "conv", "昨日の夜は何を食べたの。",
     ("昨日", "の", "夜", "は", "何", "を", "食べ", "た", "の")),
    (32, "conv", "明日は早く起きなければならない。",
     ("明日", "は", "早く", "起き", "なけれ", "ば", "なら", "ない")),
    (33, "conv", "この店のラーメンは本当においしいね。",
     ("この", "店", "の", "ラーメン", "は", "本当に", "おいしい", "ね")),
    (34, "conv", "駅まで歩いて行くのは大変だよ。",
     ("駅", "まで", "歩い", "て", "行く", "の", "は", "大変", "だ", "よ")),
    (35, "conv", "そんなこと言わないでください。",
     ("そんな", "こと", "言わ", "ない", "で", "ください")),
    (36, "conv", "雨が降りそうだから傘を持って行こう。",
     ("雨", "が", "降り", "そう", "だ", "から", "傘", "を", "持っ", "て",
      "行こ", "う")),
    (37, "conv", "もう少し待ってくれませんか。",
     ("もう", "少し", "待っ", "て", "くれ", "ませ", "ん", "か")),
    (38, "conv", "友達と映画を見に行きました。",
     ("友達", "と", "映画", "を", "見", "に", "行き", "まし", "た")),
    (39, "conv", "疲れたから今日は早く寝るよ。",
     ("疲れ", "た", "から", "今日", "は", "早く", "寝る", "よ")),
    (40, "conv", "何度も電話したのに出なかった。",
     ("何", "度", "も", "電話", "し", "た", "のに", "出", "なかっ", "た")),
    (41, "conv", "ちょっと聞きたいことがあるんだけど。",
     ("ちょっと", "聞き", "たい", "こと", "が", "ある", "ん", "だ",
      "けど")),
    (42, "conv", "昨日から頭が痛くて仕方がない。",
     ("昨日", "から", "頭", "が", "痛く", "て", "仕方", "が", "ない")),
    (43, "conv", "その話はもう聞きたくないよ。",
     ("その", "話", "は", "もう", "聞き", "たく", "ない", "よ")),
    (44, "conv", "来週の土曜日に遊びに行かない。",
     ("来週", "の", "土曜日", "に", "遊び", "に", "行か", "ない")),
    (45, "conv", "電気を消すのを忘れちゃった。",
     ("電気", "を", "消す", "の", "を", "忘れ", "ちゃっ", "た")),
     # ちゃう: IPADIC 動詞-非自立 (てしまう contraction), 連用タ接続 ちゃっ
    (46, "conv", "お腹が空いたから何か食べよう。",
     ("お腹", "が", "空い", "た", "から", "何", "か", "食べよ", "う")),
     # お腹: genuine IPADIC row (round-7 wave 369)
    (47, "conv", "あの映画はもう見たよ。",
     ("あの", "映画", "は", "もう", "見", "た", "よ")),
    (48, "conv", "寒くなってきたね。",
     ("寒く", "なっ", "て", "き", "た", "ね")),
     # the な+って lattice thief pinned: なっ must win (PARTICLE_NA)
    (49, "conv", "どこに置いたか覚えていない。",
     ("どこ", "に", "置い", "た", "か", "覚え", "て", "い", "ない")),
    (50, "conv", "走れば間に合うかもしれない。",
     ("走れ", "ば", "間に合う", "かも", "しれ", "ない")),
     # かも 副助詞 + しれ (しれる 連用形) — both IPADIC rows, wave 369
    # ---------------------------------------------------------------- keigo
    (61, "keigo", "お忙しいところ恐れ入りますが、ご確認いただけますでしょうか。",
     ("お", "忙しい", "ところ", "恐れ入り", "ます", "が", "ご", "確認",
      "いただけ", "ます", "でしょ", "う", "か")),
    (62, "keigo", "資料を添付いたしましたのでご覧ください。",
     ("資料", "を", "添付", "いたし", "まし", "た", "ので", "ご覧",
      "ください")),
    (63, "keigo", "お返事をお待ちしております。",
     ("お", "返事", "を", "お", "待ち", "し", "て", "おり", "ます")),
     # お待ち: IPADIC carries no お待ち row — 接頭詞 お + deverbal 待ち
    (64, "keigo", "ご不明な点がございましたらお知らせください。",
     ("ご", "不明", "な", "点", "が", "ござい", "まし", "たら",
      "お", "知らせ", "ください")),  # お+知らせ (deverbal noun), as 63
    (65, "keigo", "本日はお越しいただきありがとうございます。",
     ("本日", "は", "お", "越し", "いただき", "ありがとう", "ござい",
      "ます")),  # IPADIC has no お越し row: 接頭詞 お + 名詞接尾 越し
    (66, "keigo", "平素よりお世話になっております。",
     ("平素", "より", "お", "世話", "に", "なっ", "て", "おり", "ます")),
     # お世話 trimmed in wave 369 (MeCab: お|世話); に+なっ pinned vs the
     # な+って thief
    (67, "keigo", "ご迷惑をおかけして申し訳ございません。",
     ("ご", "迷惑", "を", "お", "かけ", "し", "て", "申し訳", "ござい",
      "ませ", "ん")),
     # KNOWN ENGINE DEVIATION: the wave-351 おかけ override row keeps
     # おかけ whole (お+かけ shredded into おか+けし without it); MeCab
     # reads お|かけ.  Kept in the corpus so the F1 keeps measuring it
     # until a かけ-row fix lands.
    (68, "keigo", "何卒よろしくお願い申し上げます。",
     ("何卒", "よろしく", "お願い", "申し上げ", "ます")),
     # お願い: genuine IPADIC row (stays whole)
    (69, "keigo", "会議の日程について改めてご連絡いたします。",
     ("会議", "の", "日程", "について", "改めて", "ご", "連絡", "いたし",
      "ます")),  # について: IPADIC 連語 row; ご連絡 trimmed (wave 369)
    (70, "keigo", "恐縮ですが、少々お待ちいただけますか。",
     ("恐縮", "です", "が", "少々", "お", "待ち", "いただけ", "ます",
      "か")),
    # ----------------------------------------------------------------- tech
    (81, "tech", "機械学習のモデルを大量のデータで訓練した。",
     ("機械学習", "の", "モデル", "を", "大量", "の", "データ", "で",
      "訓練", "し", "た")),  # neologd: 機械学習 (established term)
    (82, "tech", "このアルゴリズムの計算量は入力の大きさに比例する。",
     ("この", "アルゴリズム", "の", "計算量", "は", "入力", "の",
      "大きさ", "に", "比例", "する")),  # neologd: 計算量 (Wikipedia title)
    (83, "tech", "実験の結果を論文にまとめて発表する。",
     ("実験", "の", "結果", "を", "論文", "に", "まとめ", "て", "発表",
      "する")),
    (84, "tech", "サーバーの負荷を分散させる仕組みが必要だ。",
     ("サーバー", "の", "負荷", "を", "分散", "さ", "せる", "仕組み",
      "が", "必要", "だ")),
    (85, "tech", "人工知能が人間の仕事を変えつつある。",
     ("人工知能", "が", "人間", "の", "仕事", "を", "変え", "つつ",
      "ある")),  # neologd: 人工知能
    (86, "tech", "このシステムは大量の計算を並列に処理できる。",
     ("この", "システム", "は", "大量", "の", "計算", "を", "並列", "に",
      "処理", "できる")),
    (87, "tech", "データベースの設計を見直す必要がある。",
     ("データベース", "の", "設計", "を", "見直す", "必要", "が",
      "ある")),
    (88, "tech", "新しい素材は熱に強いことが確認された。",
     ("新しい", "素材", "は", "熱", "に", "強い", "こと", "が", "確認",
      "さ", "れ", "た")),
    (89, "tech", "誤差を減らすために実験が繰り返された。",
     ("誤差", "を", "減らす", "ため", "に", "実験", "が", "繰り返さ",
      "れ", "た")),
    (90, "tech", "画像認識の精度が大きく改善された。",
     ("画像認識", "の", "精度", "が", "大きく", "改善", "さ", "れ",
      "た")),  # neologd: 画像認識 (Wikipedia title)
    # ------------------------------------------------------------------ sns
    (101, "sns", "今日のライブ最高だった。",
     ("今日", "の", "ライブ", "最高", "だっ", "た")),
    (102, "sns", "新しいスマホほしいけどお金がない。",
     ("新しい", "スマホ", "ほしい", "けど", "お金", "が", "ない")),
    (103, "sns", "電車が遅れてて会議に間に合わなかった。",
     ("電車", "が", "遅れ", "て", "て", "会議", "に", "間に合わ",
      "なかっ", "た")),  # 遅れてて = 遅れて(い)て contraction: IPADIC has
                         # no てて row, so MeCab emits two successive
                         # 接続助詞 て tokens
    (104, "sns", "週末は友達とカフェ巡りしてきた。",
     ("週末", "は", "友達", "と", "カフェ", "巡り", "し", "て", "き",
      "た")),
    (105, "sns", "このゲームまじで面白すぎる。",
     ("この", "ゲーム", "まじ", "で", "面白", "すぎる")),
    (106, "sns", "朝から何も食べていない。",
     ("朝", "から", "何", "も", "食べ", "て", "い", "ない")),
    (107, "sns", "推しのグッズが当たって嬉しすぎる。",
     ("推し", "の", "グッズ", "が", "当たっ", "て", "嬉し", "すぎる")),
    (108, "sns", "電池がもう切れそうで困る。",
     ("電池", "が", "もう", "切れ", "そう", "で", "困る")),
    (109, "sns", "今日こそ早く帰るぞ。",
     ("今日", "こそ", "早く", "帰る", "ぞ")),
    (110, "sns", "写真を撮るのを忘れて後悔した。",
     ("写真", "を", "撮る", "の", "を", "忘れ", "て", "後悔", "し",
      "た")),
    # ------------------------------------------------------------------- ne
    (121, "ne", "きゃりーぱみゅぱみゅの新曲を聴いた。",
     ("きゃりーぱみゅぱみゅ", "の", "新曲", "を", "聴い", "た")),
    (122, "ne", "日本経済新聞の記事を読んだ。",
     ("日本経済新聞", "の", "記事", "を", "読ん", "だ")),  # neologd: paper name
    (123, "ne", "東京スカイツリーから富士山が見えた。",
     ("東京スカイツリー", "から", "富士山", "が", "見え", "た")),
    (124, "ne", "新宿駅で山手線に乗り換えた。",
     ("新宿駅", "で", "山手線", "に", "乗り換え", "た")),  # neologd: 駅名 fused
    (125, "ne", "関西国際空港へ行った。",
     ("関西国際空港", "へ", "行っ", "た")),  # reference golden (t08)
    (126, "ne", "東京タワーの近くで働いている。",
     ("東京タワー", "の", "近く", "で", "働い", "て", "いる")),
    (127, "ne", "新海誠の映画を友達と見た。",
     ("新海誠", "の", "映画", "を", "友達", "と", "見", "た")),
    (128, "ne", "大阪城の天守閣に登った。",
     ("大阪城", "の", "天守閣", "に", "登っ", "た")),
    (129, "ne", "鬼滅の刃の漫画を全巻持っている。",
     ("鬼滅の刃", "の", "漫画", "を", "全巻", "持っ", "て", "いる")),
     # neologd: 鬼滅の刃 (in the 2020-08-27 snapshot the reference pins)
    (130, "ne", "渋谷のスクランブル交差点は有名だ。",
     ("渋谷", "の", "スクランブル交差点", "は", "有名", "だ")),
     # neologd: スクランブル交差点 (Wikipedia title, wave 369)
    # -------------------------------------------------------------- narrative
    (141, "narr", "窓の外には雪が静かに降り続いていた。",
     ("窓", "の", "外", "に", "は", "雪", "が", "静か", "に",
      "降り続い", "て", "い", "た")),
    (142, "narr", "彼女は手紙を読むと、深いため息をついた。",
     ("彼女", "は", "手紙", "を", "読む", "と", "深い", "ため息",
      "を", "つい", "た")),
    (143, "narr", "少年は走り出した。",
     ("少年", "は", "走り出し", "た")),
    (144, "narr", "誰もいない教室で一人本を読んでいた。",
     ("誰", "も", "い", "ない", "教室", "で", "一人", "本", "を",
      "読ん", "で", "い", "た")),  # 一人 = ひとり, lexicalized IPADIC noun
    (145, "narr", "古い写真を見るたびに昔を思い出す。",
     ("古い", "写真", "を", "見る", "たび", "に", "昔", "を", "思い出す")),
    (146, "narr", "海の向こうに小さな島が見えた。",
     ("海", "の", "向こう", "に", "小さな", "島", "が", "見え", "た")),
    (147, "narr", "風が吹くたびに落ち葉が舞った。",
     ("風", "が", "吹く", "たび", "に", "落ち葉", "が", "舞っ", "た")),
    (148, "narr", "彼は何も言わずに部屋を出て行った。",
     ("彼", "は", "何", "も", "言わ", "ず", "に", "部屋", "を", "出",
      "て", "行っ", "た")),
    (149, "narr", "夜空には星が輝いていた。",
     ("夜空", "に", "は", "星", "が", "輝い", "て", "い", "た")),
     # 夜空: genuine IPADIC noun (wave 369 — engine read 夜+空 before)
    (150, "narr", "物語はここから始まるのだった。",
     ("物語", "は", "ここ", "から", "始まる", "の", "だっ", "た")),
    # ----------------------------------------------------------------- howto
    (161, "howto", "玉ねぎを薄く切って、油で炒めてください。",
     ("玉ねぎ", "を", "薄く", "切っ", "て", "油", "で", "炒め", "て",
      "ください")),
    (162, "howto", "電源を入れる前に、ケーブルを確認してください。",
     ("電源", "を", "入れる", "前", "に", "ケーブル", "を", "確認", "し",
      "て", "ください")),
    (163, "howto", "水を加えて30分ほど煮込みます。",
     ("水", "を", "加え", "て", "30", "分", "ほど", "煮込み", "ます")),
     # Arabic 30 avoids the 十分(じゅうぶん) lexical ambiguity MeCab
     # itself resolves inconsistently
    (164, "howto", "ボタンを押すと設定画面が表示されます。",
     ("ボタン", "を", "押す", "と", "設定", "画面", "が", "表示", "さ",
      "れ", "ます")),
    (165, "howto", "使用後は必ず蓋を閉めてください。",
     ("使用", "後", "は", "必ず", "蓋", "を", "閉め", "て", "ください")),
    (166, "howto", "ねじを右に回して固定します。",
     ("ねじ", "を", "右", "に", "回し", "て", "固定", "し", "ます")),
    (167, "howto", "画面の指示に従って操作してください。",
     ("画面", "の", "指示", "に", "従っ", "て", "操作", "し", "て",
      "ください")),
    (168, "howto", "生地を冷蔵庫で30分休ませます。",
     ("生地", "を", "冷蔵庫", "で", "30", "分", "休ま", "せ", "ます")),
    (169, "howto", "塩を少々加えると味が引き締まります。",
     ("塩", "を", "少々", "加える", "と", "味", "が", "引き締まり",
      "ます")),
    (170, "howto", "完成したら温かいうちに召し上がってください。",
     ("完成", "し", "たら", "温かい", "うち", "に", "召し上がっ", "て",
      "ください")),  # たら: た's 仮定形 row (round 7)
    # ----------------------------------------------------------------- mixed
    (181, "mixed", "会議は3月15日の10時から始まります。",
     ("会議", "は", "3月", "15日", "の", "10", "時", "から",
      "始まり", "ます")),  # neologd fuses date expressions — proven by
                           # the reference's own golden (10日 single,
                           # reference README.md:29); 10時 kept split —
                           # neologd-may-compound
    (182, "mixed", "この商品は1980円で販売されています。",
     ("この", "商品", "は", "1980", "円", "で", "販売", "さ", "れ", "て",
      "い", "ます")),
    (183, "mixed", "参加者は約200人に達した。",
     ("参加", "者", "は", "約", "200", "人", "に", "達し", "た")),
    (184, "mixed", "気温は25度まで上がるでしょう。",
     ("気温", "は", "25", "度", "まで", "上がる", "でしょ", "う")),
    (185, "mixed", "詳細はWEBサイトをご覧ください。",
     ("詳細", "は", "WEB", "サイト", "を", "ご覧", "ください")),
    (186, "mixed", "新しい商品は12月1日に発売される予定です。",
     ("新しい", "商品", "は", "12月", "1日", "に", "発売", "さ", "れる",
      "予定", "です")),  # 12月/1日: the neologd date class (10日 anchor)
    (187, "mixed", "定員は50名までとなっています。",
     ("定員", "は", "50", "名", "まで", "と", "なっ", "て", "い",
      "ます")),
    (188, "mixed", "売り上げは前の年より15パーセント増えた。",
     ("売り上げ", "は", "前", "の", "年", "より", "15", "パーセント",
      "増え", "た")),
    (189, "mixed", "受付は午前9時から午後5時までです。",
     ("受付", "は", "午前", "9", "時", "から", "午後", "5", "時", "まで",
      "です")),
    (190, "mixed", "会場には約3000人が集まった。",
     ("会場", "に", "は", "約", "3000", "人", "が", "集まっ", "た")),
    # ---------------------------------------------------------------- weather
    (201, "weather", "明日は全国で晴れるでしょう。",
     ("明日", "は", "全国", "で", "晴れる", "でしょ", "う")),
    (202, "weather", "午後から雨が降り出すおそれがあります。",
     ("午後", "から", "雨", "が", "降り出す", "おそれ", "が", "あり",
      "ます")),
    (203, "weather", "北海道では雪が強まる見込みです。",
     ("北海道", "で", "は", "雪", "が", "強まる", "見込み", "です")),
    (204, "weather", "各地で暑い日が続いています。",
     ("各地", "で", "暑い", "日", "が", "続い", "て", "い", "ます")),
    (205, "weather", "風が強いので外出には注意してください。",
     ("風", "が", "強い", "ので", "外出", "に", "は", "注意", "し", "て",
      "ください")),
    # ----------------------------------------------------------------- sports
    (211, "sports", "昨夜の試合は延長戦の末に決着した。",
     ("昨夜", "の", "試合", "は", "延長", "戦", "の", "末", "に", "決着",
      "し", "た")),  # 延長戦: IPADIC split 延長+戦(接尾);
                     # neologd-may-compound
    (212, "sports", "彼は大会で記録を更新した。",
     ("彼", "は", "大会", "で", "記録", "を", "更新", "し", "た")),
    (213, "sports", "チームは逆転で勝利を収めた。",
     ("チーム", "は", "逆転", "で", "勝利", "を", "収め", "た")),
    (214, "sports", "決勝は来週の日曜日に行われる。",
     ("決勝", "は", "来週", "の", "日曜日", "に", "行わ", "れる")),
    (215, "sports", "選手たちは毎朝五時から練習している。",
     ("選手", "たち", "は", "毎朝", "五", "時", "から", "練習", "し",
      "て", "いる")),  # 五時: kanji number + 接尾 時, IPADIC split
    # --------------------------------------------------------------- academic
    (216, "acad", "この理論は多くの研究によって裏付けられている。",
     ("この", "理論", "は", "多く", "の", "研究", "によって", "裏付け",
      "られ", "て", "いる")),  # によって: genuine IPADIC 連語 row
    (217, "acad", "調査の対象は全国の大学生である。",
     ("調査", "の", "対象", "は", "全国", "の", "大学生", "で", "ある")),
     # である: IPADIC splits — だ's 連用形 で + ある; no である row
    (218, "acad", "結果の解釈には注意が必要である。",
     ("結果", "の", "解釈", "に", "は", "注意", "が", "必要", "で",
      "ある")),
    (219, "acad", "先行研究との比較を行った。",
     ("先行", "研究", "と", "の", "比較", "を", "行っ", "た")),
    (220, "acad", "この仮説は実験によって検証された。",
     ("この", "仮説", "は", "実験", "によって", "検証", "さ", "れ",
      "た")),
    # ------------------------------------------------------------------ email
    (221, "email", "添付の資料をご確認のうえ、ご返信ください。",
     ("添付", "の", "資料", "を", "ご", "確認", "の", "うえ", "ご",
      "返信", "ください")),
    (222, "email", "打ち合わせの時間を変更させていただきます。",
     ("打ち合わせ", "の", "時間", "を", "変更", "さ", "せ", "て",
      "いただき", "ます")),
    (223, "email", "来週の月曜日までにお送りいたします。",
     ("来週", "の", "月曜日", "まで", "に", "お", "送り", "いたし",
      "ます")),  # お送り: 接頭詞 お + deverbal 送り (no IPADIC row)
    (224, "email", "本件について何かご質問はございますか。",
     ("本件", "について", "何", "か", "ご", "質問", "は", "ござい",
      "ます", "か")),  # について: genuine IPADIC 連語 row
    (225, "email", "今後ともよろしくお願いいたします。",
     ("今後", "とも", "よろしく", "お願い", "いたし", "ます")),
    # ---------------------------------------------------------------- cooking
    (226, "cook", "鶏肉に塩こしょうで下味をつけます。",
     ("鶏肉", "に", "塩", "こしょう", "で", "下味", "を", "つけ",
      "ます")),
    (227, "cook", "野菜を一口大に切ってください。",
     ("野菜", "を", "一口", "大", "に", "切っ", "て", "ください")),
    (228, "cook", "弱火でじっくり煮込むのがこつです。",
     ("弱火", "で", "じっくり", "煮込む", "の", "が", "こつ", "です")),
    (229, "cook", "仕上げに油を少したらします。",
     ("仕上げ", "に", "油", "を", "少し", "たらし", "ます")),
    (230, "cook", "砂糖と醤油を同じ割合で混ぜます。",
     ("砂糖", "と", "醤油", "を", "同じ", "割合", "で", "混ぜ", "ます")),
    # --------------------------------------------------------------- conv (2)
    (231, "conv", "そんなに急がなくても大丈夫だよ。",
     ("そんなに", "急が", "なく", "て", "も", "大丈夫", "だ", "よ")),
     # なくても: なく + て + も — IPADIC has no ても particle row
    (232, "conv", "もう一度最初から説明してもらえますか。",
     ("もう", "一度", "最初", "から", "説明", "し", "て", "もらえ",
      "ます", "か")),
    (233, "conv", "この辺りは夜になると静かになる。",
     ("この", "辺り", "は", "夜", "に", "なる", "と", "静か", "に",
      "なる")),
    (234, "conv", "急に予定が変わって困った。",
     ("急", "に", "予定", "が", "変わっ", "て", "困っ", "た")),
    (235, "conv", "それなら早めに出かけたほうがいい。",
     ("それ", "なら", "早め", "に", "出かけ", "た", "ほう", "が",
      "いい")),  # なら is だ's 仮定形 row in IPADIC — それ+なら, not a
                 # fused 接続詞 (the fused row is NOT in IPADIC's
                 # 接続詞 set: そして/それでは/しかし/だから…)
    (236, "conv", "財布を家に忘れてきてしまった。",
     ("財布", "を", "家", "に", "忘れ", "て", "き", "て", "しまっ",
      "た")),
    (237, "conv", "天気がいいから布団を干した。",
     ("天気", "が", "いい", "から", "布団", "を", "干し", "た")),
    (238, "conv", "鍵をどこかに落としたかもしれない。",
     ("鍵", "を", "どこ", "か", "に", "落とし", "た", "かも", "しれ",
      "ない")),
    (239, "conv", "子供のころはよく川で泳いだものだ。",
     ("子供", "の", "ころ", "は", "よく", "川", "で", "泳い", "だ",
      "もの", "だ")),
    (240, "conv", "電話が鳴ったので急いで出た。",
     ("電話", "が", "鳴っ", "た", "ので", "急い", "で", "出", "た")),
    # --------------------------------------------------------------- news (2)
    (241, "news", "新しい駅の建設が来月から始まる。",
     ("新しい", "駅", "の", "建設", "が", "来月", "から", "始まる")),
    (242, "news", "事故の影響で道路が渋滞している。",
     ("事故", "の", "影響", "で", "道路", "が", "渋滞", "し", "て",
      "いる")),
    (243, "news", "人口の減少が深刻な問題となっている。",
     ("人口", "の", "減少", "が", "深刻", "な", "問題", "と", "なっ",
      "て", "いる")),
    (244, "news", "政府は対策を検討すると述べた。",
     ("政府", "は", "対策", "を", "検討", "する", "と", "述べ", "た")),
    (245, "news", "輸入品の価格が上昇を続けている。",
     ("輸入", "品", "の", "価格", "が", "上昇", "を", "続け", "て",
      "いる")),  # 輸入品: IPADIC split 輸入+品(接尾)
    # ------------------------------------------- さ-nominal boundary probes
    (246, "narr", "建物の高さを測った。",
     ("建物", "の", "高さ", "を", "測っ", "た")),
     # 高さ: lexicalized IPADIC measurement noun — stays whole
    (247, "narr", "自然の美しさに心を打たれた。",
     ("自然", "の", "美し", "さ", "に", "心", "を", "打た", "れ",
      "た")),
     # 美しさ: NOT an IPADIC row — ガル接続 stem 美し + 接尾 さ.  The
     # engine matched this only after the wave-371 さ-nominal redesign
     # (接尾 さ row + ADJ_GARU class + lexicalized whitelist) replaced
     # the generate-for-every-adjective tier.
    # --------------------------------------------------------------- dialogue
    (251, "dialog", "「もう帰ろう」と彼は言った。",
     ("もう", "帰ろ", "う", "と", "彼", "は", "言っ", "た")),
    (252, "dialog", "彼は「分かりました」と答えた。",
     ("彼", "は", "分かり", "まし", "た", "と", "答え", "た")),
    (253, "dialog", "「ありがとう」と彼女は笑った。",
     ("ありがとう", "と", "彼女", "は", "笑っ", "た")),
    (254, "dialog", "先生がそうおっしゃいました。",
     ("先生", "が", "そう", "おっしゃい", "まし", "た")),
    (255, "dialog", "社長は席にいらっしゃいますか。",
     ("社長", "は", "席", "に", "いらっしゃい", "ます", "か")),
    # ---------------------------------------------------- grammar: voice
    (256, "gram", "子供に野菜を食べさせた。",
     ("子供", "に", "野菜", "を", "食べ", "させ", "た")),
    (257, "gram", "先生に褒められて嬉しかった。",
     ("先生", "に", "褒め", "られ", "て", "嬉しかっ", "た")),
    (258, "gram", "行かざるを得ない状況だった。",
     ("行か", "ざる", "を", "得", "ない", "状況", "だっ", "た")),
    (259, "gram", "その件はまだ決まっていません。",
     ("その", "件", "は", "まだ", "決まっ", "て", "い", "ませ", "ん")),
    (260, "gram", "彼は来ないだろうと思った。",
     ("彼", "は", "来", "ない", "だろ", "う", "と", "思っ", "た")),
    # ---------------------------------------------------- grammar: aspect
    (261, "gram", "音楽を聞きながら勉強する。",
     ("音楽", "を", "聞き", "ながら", "勉強", "する")),
    (262, "gram", "歩きつつ考えを整理した。",
     ("歩き", "つつ", "考え", "を", "整理", "し", "た")),
    (263, "gram", "テレビを見てばかりいる。",
     ("テレビ", "を", "見", "て", "ばかり", "いる")),
    (264, "gram", "水だけ飲んで寝た。",
     ("水", "だけ", "飲ん", "で", "寝", "た")),
    (265, "gram", "窓を開けたまま寝てしまった。",
     ("窓", "を", "開け", "た", "まま", "寝", "て", "しまっ", "た")),
    (266, "gram", "説明を聞けば聞くほど分からなくなる。",
     ("説明", "を", "聞け", "ば", "聞く", "ほど", "分から", "なく",
      "なる")),
    (267, "gram", "君が行くなら僕も行く。",
     ("君", "が", "行く", "なら", "僕", "も", "行く")),
    (268, "gram", "食べすぎておなかが痛い。",
     ("食べ", "すぎ", "て", "おなか", "が", "痛い")),
     # すぎ: すぎる's ichidan 連用形 row; おなか: wave-372 IPADIC row
    (269, "gram", "たとえ失敗してもあきらめない。",
     ("たとえ", "失敗", "し", "て", "も", "あきらめ", "ない")),
    (270, "gram", "必ずしも正しいとは限らない。",
     ("必ずしも", "正しい", "と", "は", "限ら", "ない")),
     # 必ずしも: IPADIC 副詞 row (wave 372)
    # --------------------------------------------------------- counters/dates
    (271, "count", "本を三冊借りた。",
     ("本", "を", "三", "冊", "借り", "た")),
    (272, "count", "卵を五個買ってきた。",
     ("卵", "を", "五", "個", "買っ", "て", "き", "た")),
    (273, "count", "第二章から読み始めた。",
     ("第", "二", "章", "から", "読み始め", "た")),
    (274, "count", "二人目の子供が生まれた。",
     ("二人", "目", "の", "子供", "が", "生まれ", "た")),
     # 二人 = ふたり, lexicalized; 目 接尾
    (275, "count", "まるで夢のような一日だった。",
     ("まるで", "夢", "の", "よう", "な", "一日", "だっ", "た")),
     # 一日 = いちにち, lexicalized IPADIC noun
    # ------------------------------------------------------------- narrative 2
    (276, "narr", "初めての海外旅行で緊張した。",
     ("初めて", "の", "海外", "旅行", "で", "緊張", "し", "た")),
    (277, "narr", "久しぶりに故郷へ帰った。",
     ("久しぶり", "に", "故郷", "へ", "帰っ", "た")),
    (278, "narr", "ほとんどの人が賛成した。",
     ("ほとんど", "の", "人", "が", "賛成", "し", "た")),
    (279, "narr", "走り続けた結果、足を痛めた。",
     ("走り続け", "た", "結果", "足", "を", "痛め", "た")),
    (280, "narr", "雨が降り始めたため、試合は中止になった。",
     ("雨", "が", "降り始め", "た", "ため", "試合", "は", "中止", "に",
      "なっ", "た")),
    (281, "narr", "あの店は安いうえにおいしい。",
     ("あの", "店", "は", "安い", "うえ", "に", "おいしい")),
    (282, "narr", "できるだけ早く返事がほしい。",
     ("できる", "だけ", "早く", "返事", "が", "ほしい")),
    (283, "narr", "この問題は解決しにくい。",
     ("この", "問題", "は", "解決", "し", "にくい")),
    (284, "narr", "今にも泣きそうな顔をしていた。",
     ("今", "に", "も", "泣き", "そう", "な", "顔", "を", "し", "て",
      "い", "た")),  # そう: the wave-371 接尾 row after a 連用形 stem
    (285, "narr", "嬉しさのあまり涙が出た。",
     ("嬉し", "さ", "の", "あまり", "涙", "が", "出", "た")),
)


def encode_span(start: int, end: int) -> int:
    return start * 1000 + end


def expected_spans(text: str, surfaces: tuple[str, ...]) -> list[int]:
    """Cursor-scan the expected surfaces to character spans.  Surfaces must
    occur in order; anything skipped between them must be punctuation or
    whitespace (validated by tests/test_parity.py — a typo in an expected
    token fails loudly here, not silently in the metric)."""
    spans: list[int] = []
    cursor = 0
    for s in surfaces:
        idx = text.index(s, cursor)
        spans.append(encode_span(idx, idx + len(s)))
        cursor = idx + len(s)
    return spans


@lru_cache(maxsize=1)
def _raw_lattice():
    from hive_udf_neologd_spark.tokenizer.dictionary import builtin_dictionary
    from hive_udf_neologd_spark.tokenizer.lattice import Lattice

    return Lattice(builtin_dictionary(), None, "normal")


def predicted_spans(text: str) -> list[int]:
    """Engine-side spans: raw NORMAL-mode segmentation (punctuation already
    discarded by the lattice), offsets reconstructed by the same cursor
    scan — valid because segmentation partitions the input in order (the
    TestLatticeFuzz invariant)."""
    lat = _raw_lattice()
    spans: list[int] = []
    cursor = 0
    for tok in lat.segment(text):
        s = tok.surface
        idx = text.index(s, cursor)
        spans.append(encode_span(idx, idx + len(s)))
        cursor = idx + len(s)
    return spans


def compute_expected() -> dict[str, tuple[int, int, int, int]]:
    """Recompute the per-register aggregates (n_sent, tp, n_pred, n_exp)
    by running the live engine over the corpus — the recapture source for
    ``T22_EXPECTED`` and the consistency gate in tests/test_parity.py."""
    agg: dict[str, list[int]] = {}
    for _sid, register, text, surfaces in PARITY_CORPUS:
        exp = set(expected_spans(text, surfaces))
        pred = set(predicted_spans(text))
        row = agg.setdefault(register, [0, 0, 0, 0])
        row[0] += 1
        row[1] += len(exp & pred)
        row[2] += len(pred)
        row[3] += len(exp)
    total = [0, 0, 0, 0]
    for row in agg.values():
        for i in range(4):
            total[i] += row[i]
    agg["__total__"] = total
    return {k: tuple(v) for k, v in sorted(agg.items())}


def micro_f1(expected: dict[str, tuple[int, int, int, int]] | None = None) -> float:
    exp = expected if expected is not None else compute_expected()
    _n, tp, n_pred, n_exp = exp["__total__"]
    return 2.0 * tp / (n_pred + n_exp) if (n_pred + n_exp) else 1.0


# RECORDED aggregates — the recapture-protocol constants the t22 oracle
# replays.  Regenerate with ``python -m hive_udf_neologd_spark.tokenizer.parity``
# after any dictionary/matrix change and paste here.  Recorded round 7 at
# 187 sentences / 17 registers: micro-F1 1.000000 — every measured
# deviation was fixed by moving the ENGINE to the corpus's expectations,
# never the reverse: おかけ via the 接頭詞 お/ご rows + the 未然形+verb
# block, the さ-nominal tier via the 接尾 さ/そう rows + ADJ_GARU class
# + the lexicalized whitelist (wave 371), batch-4 gaps via wave 372
# (おなか/必ずしも/あきらめる).
T22_EXPECTED: dict[str, tuple[int, int, int, int]] = {
    "__total__": (187, 1629, 1629, 1629),
    "acad": (5, 47, 47, 47),
    "conv": (30, 260, 260, 260),
    "cook": (5, 41, 41, 41),
    "count": (5, 35, 35, 35),
    "dialog": (5, 35, 35, 35),
    "email": (5, 46, 46, 46),
    "gram": (15, 109, 109, 109),
    "howto": (10, 96, 96, 96),
    "keigo": (10, 93, 93, 93),
    "mixed": (10, 97, 97, 97),
    "narr": (22, 192, 192, 192),
    "ne": (10, 63, 63, 63),
    "news": (25, 244, 244, 244),
    "sns": (10, 77, 77, 77),
    "sports": (5, 48, 48, 48),
    "tech": (10, 102, 102, 102),
    "weather": (5, 44, 44, 44),
}

# Gated floor on total micro-F1 (tests/test_parity.py): set just below the
# measured value at recording time so fidelity can only ratchet upward —
# a dictionary wave that costs more than ~1 point of external parity
# fails CI instead of shipping silently.  Raised 0.985 → 0.995 when the
# round-7 fixes reached 1.000 on the 152-sentence corpus.
T22_F1_FLOOR = 0.995


def t22_values_sql() -> str:
    rows = []
    for register, (n_sent, tp, n_pred, n_exp) in sorted(T22_EXPECTED.items()):
        rows.append(f"('{register}', {n_sent}, {tp}, {n_pred}, {n_exp})")
    values = ",\n  ".join(rows)
    return f"""
SELECT register, n_sent, tp, n_pred, n_exp,
       CAST(2 * tp AS DOUBLE) / (n_pred + n_exp) AS f1
FROM (VALUES
  {values}
) AS v(register, n_sent, tp, n_pred, n_exp)
ORDER BY register
"""


if __name__ == "__main__":
    computed = compute_expected()
    print("T22_EXPECTED = {")
    for k, v in computed.items():
        print(f"    {k!r}: {v},")
    print("}")
    print(f"# micro-F1 = {micro_f1(computed):.6f}")
