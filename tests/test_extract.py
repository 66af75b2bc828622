"""Markup → main-text extraction (functions/extract.py): the block
heuristics must kill boilerplate by CONTENT (brevity / link density),
not by tag name, and the pipeline stage must slot in front of
quality_filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.functions import extract as E
from async_event_streams_spark.pipelines import extract_text, quality_filter

BODY = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _page(body_blocks: str) -> str:
    return (
        "<html><head><title>t</title><style>body { x: 1; }</style>"
        "<script>var a = 'nav footer words that must not leak';</script>"
        '</head><body><nav><a href="/">home</a> <a href="/d">docs</a>'
        ' <a href="/a">about us</a> <a href="/c">contact</a></nav>'
        f"{body_blocks}"
        '<footer><a href="/p">privacy</a> <a href="/t">terms</a>'
        " copyright 2024 example corp</footer></body></html>"
    )


def _extract(spark, html: str) -> dict:
    row = (
        spark.range(1)
        .select(
            E.extract_main_text(F.lit(html)).alias("main"),
            F.size(E.page_blocks(F.lit(html))).alias("n_blocks"),
        )
        .first()
    )
    return {"main": row.main, "n_blocks": row.n_blocks}


def test_boilerplate_dropped_body_kept(spark):
    got = _extract(spark, _page(f"<p>{BODY}</p>"))
    assert got["main"] == BODY  # nav/footer/title/script/style all gone
    assert "home" not in got["main"] and "copyright" not in got["main"]


def test_script_payload_never_leaks(spark):
    # Script text contains plausible words; it must vanish before
    # block-splitting, not survive as a "long enough" block.
    got = _extract(spark, _page(f"<p>{BODY}</p><p>{BODY}</p>"))
    assert "leak" not in got["main"]
    assert got["main"] == f"{BODY} {BODY}"


def test_link_dense_long_block_dropped(spark):
    # 12 words — passes the length gate — but nearly all of them are
    # anchor text: the link-density rule must drop it (tag names alone
    # would keep this <div>).
    links = " ".join(f'<a href="/{i}">link word {i}</a>' for i in range(6))
    got = _extract(spark, _page(f"<div>{links}</div><p>{BODY}</p>"))
    assert got["main"] == BODY


def test_short_block_dropped(spark):
    got = _extract(spark, _page(f"<p>too few words here</p><p>{BODY}</p>"))
    assert got["main"] == BODY


def test_synth_roundtrip_recovers_full_paragraphs(spark):
    # A synthesized page's kept blocks are exactly the 20-word
    # paragraphs; a short tail paragraph is dropped by the length gate.
    text = " ".join(f"w{i}" for i in range(45))  # 20 + 20 + 5
    row = (
        spark.range(1)
        .select(
            E.extract_main_text(
                E.synth_html(F.lit(text), F.lit(7))
            ).alias("main")
        )
        .first()
    )
    assert row.main == " ".join(f"w{i}" for i in range(40))


def test_pipeline_stage_feeds_quality_filter(spark):
    text = " ".join(f"w{i}" for i in range(40))
    pages = spark.range(4).select(
        F.col("id").alias("doc_id"),
        E.synth_html(F.lit(text), F.col("id")).alias("html"),
    )
    docs = extract_text(pages)
    assert "html" not in docs.columns and "text" in docs.columns
    out = quality_filter(docs)
    assert out.count() == 4  # 40 extracted words pass the token gate
    assert out.select(F.min(F.length("text"))).first()[0] > 0


def test_no_body_page_dropped(spark):
    pages = spark.createDataFrame(
        [(1, _page(""))], "doc_id long, html string"
    )
    assert extract_text(pages).count() == 0
