"""Markup → main-text extraction (pretraining stage 0).

Every real web-scale pipeline starts by boiling HTML down to main text
before any quality gate sees it (trafilatura/jusText-style): drop
``<script>``/``<style>`` payloads, split the page into blocks, and keep
only blocks that look like body copy — enough words, low link density.
Navigation bars, footers, and ad inserts die on the *heuristic*, not on
their tag names, so the rule transfers to pages we didn't synthesize.

Because the test corpus carries clean text (no markup column), the
module also provides a DETERMINISTIC markup synthesizer: it wraps each
document in a fixed page skeleton (head + title + style + script, a
link-dense nav, an ad ``div`` on even doc_ids, 20-word ``<p>``
paragraphs, a short footer). Synthesis and extraction both exist as
Spark Column expressions and as DuckDB SQL fragments generated from the
SAME constants, so the oracle replays the identical computation.

Scale shape: synthesis + extraction are pure per-row expressions
(regexp + higher-order array functions) — whole-stage codegen, zero
shuffles, embarrassingly parallel over a 100 TB scan. No Python UDFs.

No reference analog (driver mandate extension beyond
/root/reference/src/lib.rs's pub/sub surface).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared heuristics (single source of truth for both engines).
PARA_WORDS = 20  # words per synthesized <p> block
MIN_BLOCK_WORDS = 10  # keep threshold: body copy has at least this many
LINK_DENSITY_X = 3  # keep iff link_chars * X < text_chars

# Both engines: Java regex (Spark) and RE2 (DuckDB) — the subset below
# parses and behaves identically in both (no backreferences: RE2 has
# none, which is why script/style are two patterns instead of <(s|s)>).
_RE_SCRIPT = r"(?s)<script[^>]*>.*?</script>"
_RE_STYLE = r"(?s)<style[^>]*>.*?</style>"
_RE_BLOCK_END = r"</p>|</nav>|</footer>|</div>|</title>|</h1>"
_RE_TAG = r"<[^>]*>"
_RE_ANCHOR_TEXT = r"<a [^>]*>([^<]*)</a>"

_NAV = (
    '<nav><a href="/">home</a> <a href="/docs">docs</a> '
    '<a href="/about">about us</a> <a href="/contact">contact</a></nav>'
)
_AD = '<div class="ad">subscribe to our newsletter now</div>'
_FOOTER = (
    '<footer><a href="/privacy">privacy</a> <a href="/terms">terms</a> '
    "copyright 2024 example corp</footer>"
)
_STYLE = "<style>body { color: #222; }</style>"


# ---------------------------------------------------------------------------
# Synthesis — Spark
# ---------------------------------------------------------------------------


def synth_html(text: Column, doc_id: Column) -> Column:
    """Deterministic page around a clean-text document (see module doc)."""
    w = F.split(F.trim(text), r"\s+")
    n_para = F.ceil(F.size(w) / F.lit(PARA_WORDS)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_para - 1),
        lambda i: F.concat(
            F.lit("<p>"),
            F.array_join(F.slice(w, i * PARA_WORDS + 1, PARA_WORDS), " "),
            F.lit("</p>"),
        ),
    )
    return F.concat(
        F.lit("<html><head><title>document "),
        doc_id.cast("string"),
        F.lit("</title>" + _STYLE + "<script>var page = "),
        doc_id.cast("string"),
        F.lit(";</script></head><body>" + _NAV),
        F.when(doc_id % 2 == 0, F.lit(_AD)).otherwise(F.lit("")),
        F.array_join(paras, ""),
        F.lit(_FOOTER + "</body></html>"),
    )


# ---------------------------------------------------------------------------
# Extraction — Spark
# ---------------------------------------------------------------------------


def strip_block(block: Column) -> Column:
    """Block → visible text: drop tags, collapse whitespace, trim."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(block, _RE_TAG, " "), r"\s+", " ")
    )


def word_count(s: Column) -> Column:
    return F.when(F.length(s) == 0, F.lit(0)).otherwise(F.size(F.split(s, " ")))


def _link_chars(block: Column) -> Column:
    return F.aggregate(
        F.regexp_extract_all(block, F.lit(_RE_ANCHOR_TEXT), F.lit(1)),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )


def keep_block(block: Column) -> Column:
    s = strip_block(block)
    return (word_count(s) >= MIN_BLOCK_WORDS) & (
        _link_chars(block) * LINK_DENSITY_X < F.length(s)
    )


def page_blocks(html: Column) -> Column:
    """Candidate blocks of a page: script/style payloads removed, split
    at closing block tags; blocks with no visible text are not
    candidates (also normalizes away engine differences in trailing
    empty split fields)."""
    clean = F.regexp_replace(F.regexp_replace(html, _RE_SCRIPT, " "), _RE_STYLE, " ")
    return F.filter(
        F.split(clean, _RE_BLOCK_END), lambda b: F.length(strip_block(b)) > 0
    )


def page_block_stats(html: Column) -> Column:
    """Candidate blocks pre-reduced to ``struct<s: visible text, lc:
    link chars>`` — the strip/link regexes run ONCE per block here and
    every downstream decision (candidate, keep, join) reads the struct,
    instead of re-stripping in each lambda (~5 regex passes per block
    collapsed to 2; measured 4.9 → 3.3 s at the 100× probe)."""
    clean = F.regexp_replace(F.regexp_replace(html, _RE_SCRIPT, " "), _RE_STYLE, " ")
    stats = F.transform(
        F.split(clean, _RE_BLOCK_END),
        lambda b: F.struct(
            strip_block(b).alias("s"), _link_chars(b).alias("lc")
        ),
    )
    return F.filter(stats, lambda t: F.length(t["s"]) > 0)


def keep_stat(t: Column) -> Column:
    """keep_block() over a page_block_stats() struct."""
    return (word_count(t["s"]) >= MIN_BLOCK_WORDS) & (
        t["lc"] * LINK_DENSITY_X < F.length(t["s"])
    )


def extract_main_text(html: Column) -> Column:
    """Main text of a page: kept blocks (word count ≥ MIN_BLOCK_WORDS,
    link chars × LINK_DENSITY_X < text chars) stripped and joined."""
    kept = F.filter(page_block_stats(html), keep_stat)
    return F.array_join(F.transform(kept, lambda t: t["s"]), " ")


def kept_blocks(html: Column) -> Column:
    return F.filter(page_blocks(html), keep_block)


# ---------------------------------------------------------------------------
# DuckDB twins (same constants, same order of operations)
# ---------------------------------------------------------------------------


def sql_synth_html(text: str = "text", doc_id: str = "doc_id") -> str:
    """DuckDB twin of synth_html(); `text`/`doc_id` are SQL expressions."""
    w = f"regexp_split_to_array(trim({text}), '\\s+')"
    paras = (
        f"list_transform(range(0, CAST(ceil(len({w}) / {PARA_WORDS}.0) AS BIGINT)), "
        f"i -> '<p>' || array_to_string("
        f"({w})[(i * {PARA_WORDS} + 1):((i + 1) * {PARA_WORDS})], ' ') || '</p>')"
    )
    return (
        f"'<html><head><title>document ' || CAST({doc_id} AS VARCHAR) || "
        f"'</title>{_STYLE}<script>var page = ' || CAST({doc_id} AS VARCHAR) || "
        f"';</script></head><body>{_NAV}' || "
        f"(CASE WHEN {doc_id} % 2 = 0 THEN '{_AD}' ELSE '' END) || "
        f"array_to_string({paras}, '') || "
        f"'{_FOOTER}</body></html>'"
    )


def sql_strip_block(b: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace({b}, '{_RE_TAG}', ' ', 'g'), "
        "'\\s+', ' ', 'g'))"
    )


def sql_word_count(s: str) -> str:
    return f"(CASE WHEN len({s}) = 0 THEN 0 ELSE len(string_split({s}, ' ')) END)"


def _sql_link_chars(b: str) -> str:
    return (
        "COALESCE(list_sum(list_transform("
        f"regexp_extract_all({b}, '{_RE_ANCHOR_TEXT}', 1), x -> len(x))), 0)"
    )


def sql_page_blocks(html: str) -> str:
    clean = (
        f"regexp_replace(regexp_replace({html}, '{_RE_SCRIPT}', ' ', 'g'), "
        f"'{_RE_STYLE}', ' ', 'g')"
    )
    return (
        f"list_filter(regexp_split_to_array({clean}, '{_RE_BLOCK_END}'), "
        f"x -> len({sql_strip_block('x')}) > 0)"
    )


def sql_page_block_stats(html: str) -> str:
    """DuckDB twin of page_block_stats()."""
    clean = (
        f"regexp_replace(regexp_replace({html}, '{_RE_SCRIPT}', ' ', 'g'), "
        f"'{_RE_STYLE}', ' ', 'g')"
    )
    stats = (
        f"list_transform(regexp_split_to_array({clean}, '{_RE_BLOCK_END}'), "
        f"x -> {{'s': {sql_strip_block('x')}, 'lc': {_sql_link_chars('x')}}})"
    )
    return f"list_filter({stats}, t -> len(t['s']) > 0)"


def sql_keep_stat(t: str = "t") -> str:
    """DuckDB twin of keep_stat()."""
    s = t + "['s']"
    return (
        f"({sql_word_count(s)} >= {MIN_BLOCK_WORDS} AND "
        f"{t}['lc'] * {LINK_DENSITY_X} < len({s}))"
    )


def sql_keep_pred(b: str = "x") -> str:
    s = sql_strip_block(b)
    return (
        f"({sql_word_count(s)} >= {MIN_BLOCK_WORDS} AND "
        f"{_sql_link_chars(b)} * {LINK_DENSITY_X} < len({s}))"
    )


def sql_extract_main_text(blocks: str) -> str:
    """DuckDB twin of extract_main_text() over a blocks expression
    (pass sql_page_blocks(...) or a CTE column holding it)."""
    kept = f"list_filter({blocks}, x -> {sql_keep_pred('x')})"
    return f"array_to_string(list_transform({kept}, x -> {sql_strip_block('x')}), ' ')"
