"""Spark-side tests for the tokenize_ja pandas UDF (SURVEY.md §2.1 O1-O11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_neologd_spark import register_udfs, tokenize_ja, tokenize_ja_version
from hive_udf_neologd_spark.version import VERSION


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "きゃりーぱみゅぱみゅ。"),
            (2, "日本経済新聞。"),
            (3, None),
            (4, "the fast key order"),
        ],
        "id bigint, text string",
    )


def test_udf_basic_and_null(spark, docs):
    tok = tokenize_ja()
    rows = {r["id"]: r["toks"] for r in docs.select("id", tok("text").alias("toks")).collect()}
    assert rows[1] == ["きゃりーぱみゅぱみゅ"]
    assert rows[2] == ["日本経済新聞"]
    assert rows[3] is None  # O9: null → null, not []
    assert rows[4] == ["the", "fast", "key", "order"]


def test_udf_return_type_is_array_of_string(spark, docs):
    out = docs.select(tokenize_ja()("text").alias("toks"))
    assert out.schema["toks"].dataType.simpleString() == "array<string>"


def test_udf_with_user_dict(spark, docs):
    tok = tokenize_ja(user_dict=["日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞"])
    row = docs.filter("id = 2").select(tok("text").alias("t")).first()
    assert row["t"] == ["日本", "経済", "新聞"]


def test_udf_construction_errors_are_plan_time(spark):
    # Fail-at-plan-time like the reference's initialize (SURVEY.md §3).
    with pytest.raises(ValueError):
        tokenize_ja(mode="unsupported mode")
    with pytest.raises(TypeError):
        tokenize_ja(user_dict=123)


def test_sql_registration(spark, docs):
    register_udfs(spark)
    docs.createOrReplaceTempView("docs_udf_test")
    out = spark.sql(
        "select id, tokenize_ja_neologd(text) as toks from docs_udf_test where id = 1"
    ).first()
    assert out["toks"] == ["きゃりーぱみゅぱみゅ"]
    ver = spark.sql("select tokenize_ja_neologd_version() as v").first()["v"]
    assert ver == [VERSION] and len(ver) == 1  # 0-arg → 1 element (O2)


def test_same_name_zero_arg_overload(spark, docs):
    # O2: the reference's verbatim install smoke test (its README.md:26-27)
    # — SELECT tokenize_ja_neologd() with NO arguments on the SAME name as
    # the tokenizer — works via the sentinel-DEFAULT SQL function.
    register_udfs(spark)
    assert spark.sql("SELECT tokenize_ja_neologd() AS v").first()["v"] == [VERSION]
    assert spark.sql("SELECT tokenize_ja() AS v").first()["v"] == [VERSION]
    # O9 through the overload: explicit NULL still propagates as NULL.
    assert spark.sql("SELECT tokenize_ja_neologd(NULL) AS t").first()["t"] is None
    # And the 1-arg path still tokenizes (both names).
    docs.createOrReplaceTempView("docs_udf_overload")
    row = spark.sql(
        "SELECT tokenize_ja(text) AS t FROM docs_udf_overload WHERE id = 1"
    ).first()
    assert row["t"] == ["きゃりーぱみゅぱみゅ"]


def test_zero_arg_return_shape_is_reference_parity(spark):
    # O2 return-TYPE parity (VERDICT r5 'What's wrong' #1): the reference
    # wraps the version in Collections.singletonList(new Text(...)) under a
    # list ObjectInspector (KuromojiNEologdUDF.java:115-116,128) and its
    # README.md:27 shows ["{VERSION}-{NEOLOGD_VERSION_DATE}"] — i.e. a
    # 1-element array<string>, exactly what the 0-arg SQL call returns here.
    register_udfs(spark)
    df = spark.sql("SELECT tokenize_ja_neologd() AS v")
    assert df.schema["v"].dataType.simpleString() == "array<string>"
    rows = df.collect()
    assert [r["v"] for r in rows] == [[VERSION]]
    assert len(rows[0]["v"]) == 1 and isinstance(rows[0]["v"][0], str)


def test_overload_one_arg_path_stays_vectorized(spark, docs):
    # The SQL function must inline to a CASE over the pandas UDF —
    # ArrowEvalPython in the plan, never a row-at-a-time BatchEvalPython.
    register_udfs(spark)
    docs.createOrReplaceTempView("docs_udf_plan")
    plan = (
        spark.sql("SELECT tokenize_ja_neologd(text) AS t FROM docs_udf_plan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_version_introspection():
    assert tokenize_ja_version() == [VERSION]


def test_explode_pipeline(spark, docs):
    # The canonical consumer: tokenize → explode → count (SURVEY.md §2.3).
    tok = tokenize_ja()
    out = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(tok("text")).alias("token"))
        .groupBy("token")
        .count()
    )
    counts = {r["token"]: r["count"] for r in out.collect()}
    assert counts["きゃりーぱみゅぱみゅ"] == 1 and counts["the"] == 1


def test_tokenize_rich_structs(spark):
    from hive_udf_neologd_spark.functions.tokenize import tokenize_ja, tokenize_ja_rich
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("日本経済新聞を読む。",), (None,)], "text string")
    rich = tokenize_ja_rich()
    rows = df.select(F.col("text"), rich("text").alias("toks")).collect()
    toks = rows[0]["toks"]
    assert toks is not None and len(toks) > 0
    # Struct fields present; terms match the plain UDF's output exactly.
    plain = df.select(tokenize_ja()("text").alias("t")).collect()[0]["t"]
    assert [t["term"] for t in toks] == plain
    assert all(t["pos"] for t in toks)
    # Null line → null array (O9 carries over to the extension).
    assert rows[1]["toks"] is None
