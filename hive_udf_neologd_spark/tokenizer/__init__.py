"""Pure-Python Japanese morphological tokenizer.

Replaces the reference's Lucene ``JapaneseAnalyzer`` chain
(KuromojiNEologdUDF.java:141; pipeline per Lucene 5.5.5 public source,
SURVEY.md §2.2) with a lattice/Viterbi engine over a pinned built-in
NEologd-style lexicon plus the six post-tokenization filters.
"""

from hive_udf_neologd_spark.tokenizer.analyzer import JapaneseAnalyzer, Mode
from hive_udf_neologd_spark.tokenizer.dictionary import UserDictionary, fetch_user_dict_url

__all__ = ["JapaneseAnalyzer", "Mode", "UserDictionary", "fetch_user_dict_url"]
