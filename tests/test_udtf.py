"""Python UDTF (table function) surface: one input row → many output
rows, registered and callable from SQL (Spark 4 `udtf`)."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


def test_udtf_explodes_tokens(spark):
    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    rows = Tokenize(lit("spark native event streams")).collect()
    assert [(r.word, r.pos) for r in rows] == [
        ("spark", 0),
        ("native", 1),
        ("event", 2),
        ("streams", 3),
    ]


def test_udtf_lateral_join_from_sql(spark):
    from pyspark.sql.functions import udtf as udtf_deco

    @udtf_deco(returnType="chunk: string")
    class Chunks:
        def eval(self, text: str, size: int):
            w = text.split()
            for i in range(0, len(w), size):
                yield (" ".join(w[i : i + size]),)

    spark.udtf.register("chunks", Chunks)
    spark.createDataFrame(
        [("a b c d e",), ("f g",)], "text string"
    ).createOrReplaceTempView("docs_tmp")
    got = spark.sql(
        "SELECT t.chunk FROM docs_tmp, LATERAL chunks(text, 2) t"
    ).collect()
    assert sorted(r.chunk for r in got) == ["a b", "c d", "e", "f g"]
