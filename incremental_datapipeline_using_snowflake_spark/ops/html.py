"""HTML → text extraction — the step between a crawl's raw response
records and the ``documents`` table (WET files ship pre-extracted text;
raw WARC response records carry HTML, and every text pipeline strips the
markup + boilerplate before quality gating).

Reference shape: the reference ingests an already-clean feed
(``scripts/noaa_co2_data_loader.py``); this covers the messy upstream a
crawl corpus has instead.

Dependency-free and engine-portable by design: the whole extraction is a
fixed chain of regex rewrites over ``pyspark.sql.functions`` Column
expressions — whole-stage codegen, zero UDFs — and the DuckDB oracle
replays the identical chain (both engines' regex dialects support the
``(?is)`` inline flags and non-greedy quantifiers used here). This is the
conservative tag-level subset: visible text with block boundaries kept as
newlines. It does NOT attempt render-level boilerplate judgment
(readability/trafilatura class) — pair with ``ops.text`` quality gates
(length/stopword/repetition) to drop nav-heavy extractions downstream.

Order of operations matters and is part of the contract:

1. the ``<head>`` block drops WITH its content (``<title>`` separately,
   for fragments without a head wrapper — r09: title text is chrome, not
   visible body text, and it polluted every extraction's first line),
   then ``<script>``/``<style>``/``<template>``/``<noscript>`` blocks
   WITH their content (executable/invisible payloads — the #1 junk
   source), then HTML comments;
2. block-closing tags (``</p>``, ``</div>``, ``</li>``, headings,
   ``<br>``, table rows) become newlines so words from different blocks
   never concatenate;
3. every remaining tag strips;
4. the common entities decode (``&amp;`` LAST so ``&amp;lt;`` yields
   ``&lt;`` — a literal, not a tag);
5. horizontal whitespace collapses within lines, blank runs collapse to
   single newlines, edges trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; patterns use (?is) where block
# content spans lines. Kept as data so the DuckDB oracle can be GENERATED
# from the same table (single source of truth for both engines).
#
# The invisible-payload prefix (head, title, script, style, template,
# noscript, comments) is its OWN named list because main-content extraction
# shares exactly this pre-clean contract — building the full chain by
# concatenation means a future insertion into either list can never silently
# shift what "pre-clean" means (r09 used a positional [:7] slice, which a
# reorder would have broken without an error).
HTML_PRECLEAN_STEPS: list[tuple[str, str]] = [
    (r"(?is)<head\b[^>]*>.*?</head\s*>", " "),
    (r"(?is)<title\b[^>]*>.*?</title\s*>", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<template\b[^>]*>.*?</template\s*>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
]

HTML_STRIP_STEPS: list[tuple[str, str]] = HTML_PRECLEAN_STEPS + [
    (r"(?i)<(?:br|hr)\s*/?\s*>", "\n"),
    (r"(?is)</(?:p|div|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|blockquote|title|head)\s*>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # full whitespace trim (plain trim() strips spaces only, so an
    # all-markup page would keep a bare newline instead of yielding '')
    (r"^\s+|\s+$", ""),
]


def html_to_text(html: Column | str) -> Column:
    """Visible text of an HTML document (module-docstring contract) as one
    Column expression chain — codegen end to end, no UDFs.

    COMPATIBILITY NOTE (r09 behavior change): since r09 the ``<head>`` /
    ``<title>`` content is DROPPED (it is chrome, not body text), which
    changes the extracted text — and therefore the length, fingerprint,
    and exact-dup hash — of every head-bearing page relative to a corpus
    ingested with the pre-r09 chain. Re-ingesting the same crawl file
    against such a store will NOT resolve those pages as exact corpus
    dups across the upgrade boundary (near-dup LSH still catches most).
    New stores are self-consistent; for an existing pre-r09 corpus either
    re-bootstrap it or accept the one-time duplicate window."""
    c = F.col(html) if isinstance(html, str) else html
    for pat, rep in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text`, GENERATED from the same step
    table — the oracle replays the byte-identical rewrite chain (every
    replacement here is either plain text or exactly one newline)."""
    out = expr
    for pat, rep in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r_sql = "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r_sql}, 'g')"
    return out


# ---------------------------------------------------------------------------
# Main-content extraction (r09) — block-level boilerplate removal, the
# jusText-shape judgment layer between html_to_text's conservative
# tag-stripping and the ops.text quality gates: real crawl pages are mostly
# nav bars, sidebars, footers and related-links chrome, which tag-stripping
# keeps and which then drags every page-level quality signal down.
#
# Method (Pomikálek 2011's two strongest signals, kept deterministic and
# engine-portable): segment the page into BLOCKS at block-level tag
# boundaries, then keep a block iff
#   (a) its visible text is long enough (>= MAIN_MIN_CHARS chars — short
#       blocks are headings/menu items/buttons), and
#   (b) its LINK DENSITY is low (anchor-text chars * MAIN_LINK_DENSITY_DEN
#       <= text chars — nav/related-links blocks are mostly anchor text).
# Both tests are INTEGER arithmetic over regex-derived lengths, so the
# DuckDB oracle replays the decision bit-for-bit (no float density). The
# full stopword-density ML variants need language models; this is the
# deterministic core that removes structural chrome.
# ---------------------------------------------------------------------------
MAIN_MIN_CHARS = 25
MAIN_LINK_DENSITY_DEN = 3  # keep iff link_chars * 3 <= text_chars

# pre-clean = the shared invisible-payload chain (head, title, script,
# style, template, noscript, comments) — same named list html_to_text's
# full chain is built from, so the two can never drift apart
MAIN_PRECLEAN_STEPS: list[tuple[str, str]] = HTML_PRECLEAN_STEPS

# block segmentation: any block-level open OR close tag is a boundary
# (inline tags — a, span, b, i, em, code... — stay inside their block)
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|"
    r"article|header|footer|nav|aside|main|blockquote|form|figure|"
    r"figcaption|br|hr)\b[^>]*>"
)

# anchor text: capture group 1 of every <a ...>...</a> in the raw block
ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

# per-block visible text: strip remaining (inline) tags, decode entities
# (&amp; LAST — HTML_STRIP_STEPS contract), collapse whitespace, trim
BLOCK_TEXT_STEPS: list[tuple[str, str]] = [
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"\s+", " "),
    (r"^\s+|\s+$", ""),
]


def _block_text(c: Column) -> Column:
    for pat, rep in BLOCK_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def extract_main_content(html: Column | str) -> Column:
    """Main text of an HTML page with structural boilerplate removed
    (module comment above: block segmentation + length gate + integer
    link-density gate). Pure Column expression chain — regex rewrites plus
    array higher-order functions, whole-stage codegen, zero UDFs, zero
    exchanges. Kept blocks join with newlines, preserving block order."""
    c = F.col(html) if isinstance(html, str) else html
    for pat, rep in MAIN_PRECLEAN_STEPS:
        c = F.regexp_replace(c, pat, rep)
    blocks = F.split(c, BLOCK_SPLIT_RE)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("t"),
            _block_text(
                F.array_join(
                    F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), 1), " "
                )
            ).alias("l"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= F.lit(MAIN_MIN_CHARS))
        & (
            F.length(s["l"]) * F.lit(MAIN_LINK_DENSITY_DEN)
            <= F.length(s["t"])
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n")


def _block_text_sql(expr: str) -> str:
    out = expr
    for pat, rep in BLOCK_TEXT_STEPS:
        p = pat.replace("'", "''")
        r_sql = "'" + rep.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r_sql}, 'g')"
    return out


def main_content_sql(expr: str) -> str:
    """DuckDB twin of :func:`extract_main_content`, GENERATED from the
    same step tables and constants — pre-clean chain, block split, per-
    block text/anchor lengths, and the identical integer keep test."""
    out = expr
    for pat, rep in MAIN_PRECLEAN_STEPS:
        p = pat.replace("'", "''")
        r_sql = "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r_sql}, 'g')"
    split_re = BLOCK_SPLIT_RE.replace("'", "''")
    anchor_re = ANCHOR_TEXT_RE.replace("'", "''")
    blk_t = _block_text_sql("b")
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — a linkless block must score 0 link chars
    blk_l = _block_text_sql(
        f"coalesce(array_to_string(regexp_extract_all(b, '{anchor_re}', 1), ' '), '')"
    )
    return (
        "array_to_string(list_transform(list_filter(list_transform("
        f"string_split_regex({out}, '{split_re}'), "
        f"b -> struct_pack(t := {blk_t}, l := {blk_l})), "
        f"s -> length(s.t) >= {MAIN_MIN_CHARS} "
        f"AND length(s.l) * {MAIN_LINK_DENSITY_DEN} <= length(s.t)), "
        "s -> s.t), chr(10))"
    )


def extract_main_documents(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text, n_chars_html, n_chars_text) with ``text`` =
    :func:`extract_main_content` — the drop-in boilerplate-removing twin
    of :func:`extract_html_documents` for crawl ingestion; pages that are
    ALL chrome extract to ``''`` and the quality gate owns the drop."""
    txt = extract_main_content(F.col(html_col))
    return df.select(
        F.col(id_col),
        txt.alias("text"),
        F.length(F.col(html_col)).alias("n_chars_html"),
        F.length(txt).alias("n_chars_text"),
    )


def extract_html_documents(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text, n_chars_html, n_chars_text): the ingestion projection a
    crawl pipeline runs per record — narrow, shuffle-free, ready for
    ``ops.text`` quality gates. Rows whose extraction is empty (pure
    markup) carry ``text = ''`` rather than being dropped — the quality
    gate owns the drop decision."""
    txt = html_to_text(F.col(html_col))
    return df.select(
        F.col(id_col),
        txt.alias("text"),
        F.length(F.col(html_col)).alias("n_chars_html"),
        F.length(txt).alias("n_chars_text"),
    )
