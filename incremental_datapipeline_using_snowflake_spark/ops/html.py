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

1. ``<script>``/``<style>``/``<template>``/``<noscript>`` blocks drop
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
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<template\b[^>]*>.*?</template\s*>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
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
    Column expression chain — codegen end to end, no UDFs."""
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
