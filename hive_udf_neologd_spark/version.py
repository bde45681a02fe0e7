"""Version introspection.

The reference exposes its artifact version through the 0-arg UDF call
(KuromojiNEologdUDF.java:121-129) reading a maven-filtered ``.properties``
(pom.xml:66-72) stamped ``{VERSION}-{NEOLOGD_DATE}`` = ``0.1.1-20200827``
(VERSION:1, NEOLOGD_VERSION_DATE:1).  We keep the same two-part scheme:
engine version + pinned-dictionary date.
"""

ENGINE_VERSION = "0.1.0"
# Dictionary snapshot the built-in lexicon is pinned against (the reference's
# NEologd snapshot date, NEOLOGD_VERSION_DATE:1).
DICTIONARY_DATE = "20200827"
# Reference artifact version string, for parity assertions.
REFERENCE_VERSION = "0.1.1-20200827"
# What the 0-arg call returns: engine-version dash dictionary-date,
# mirroring build.sh:274-277's `{VERSION}-{NEOLOGD_DATE}` stamping.
VERSION = f"{ENGINE_VERSION}-{DICTIONARY_DATE}"
