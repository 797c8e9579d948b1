"""HTML → text extraction, pure JVM column expressions.

The downstream step the WARC source (sources/walker.py `_walk_warc`)
feeds: captured response bodies are HTML, training corpora want the
visible text. Everything here is a composition of `regexp_replace` /
`replace` built-ins — whole-stage-codegen'd, no Python in the hot
path, so at 100 TB this runs at scan speed like the other text ops.

Java and RE2 regex dialects agree on every construct used here
(inline ``(?is)`` flags, non-greedy ``.*?``, character classes), which
is what lets the DuckDB oracle run the same pipeline verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# patterns shared verbatim by the Spark expressions and the DuckDB
# oracle (tools/check_correctness.py runs the SQL twin) — order matters
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # non-visible element bodies first, while their tags still exist
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<title\b[^>]*>.*?</title>", " "),  # head text isn't body text
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries (both opening and closing tags) become
    # line breaks so adjacent blocks don't glue into one line
    (r"(?i)<(?:br|hr)\s*/?>", "\n"),
    (
        r"(?is)</?(?:p|div|li|ul|ol|tr|table|h[1-6]|blockquote|section"
        r"|article|header|footer|pre)\b[^>]*>",
        "\n",
    ),
    # every remaining tag is inline: drop to a space
    (r"(?s)<[^>]*>", " "),
)

# minimal entity set (named + the numeric forms the named ones alias)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so freed ampersands don't re-trigger
)


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML document: script/style/comment removal,
    block-boundary line breaks, tag strip, entity decode, whitespace
    collapse (spaces within lines, blank-line dedup across lines)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"[ \t\r\f]+", " ")  # within-line runs
    out = F.regexp_replace(out, r" ?\n ?", "\n")  # spaces hugging breaks
    out = F.regexp_replace(out, r"\n{2,}", "\n")  # blank-line runs
    # Spark's trim strips only spaces; edges may hold newlines too
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def html_title(col: Column | str) -> Column:
    """<title> contents (first match), entity-decoded and trimmed;
    NULL when absent."""
    raw = F.regexp_extract(
        F.col(col) if isinstance(col, str) else col,
        r"(?is)<title\b[^>]*>(.*?)</title>",
        1,
    )
    out = raw
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return F.when(out != "", out)


def html_links(col: Column | str) -> Column:
    """array<string> of href targets, in document order."""
    return F.regexp_extract_all(
        F.col(col) if isinstance(col, str) else col,
        F.lit(r"""(?is)<a\s[^>]*href\s*=\s*["']([^"'>]+)["']"""),
        1,
    )


def oracle_html_to_text_sql(expr: str) -> str:
    """The DuckDB twin of ``html_to_text`` over SQL expression ``expr``
    — same steps, same order, RE2 dialect (needs the 'g' flag that
    Spark's replace-all default makes implicit)."""
    out = expr
    for pat, repl in HTML_STRIP_STEPS:
        sql_pat = pat.replace("'", "''")
        sql_repl = repl.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{sql_pat}', '{sql_repl}', 'g')"
    for ent, ch in HTML_ENTITIES:
        sql_ch = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{sql_ch}')"
    out = f"regexp_replace({out}, '[ \\t\\r\\f]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{2,}}', chr(10), 'g')"
    return f"regexp_replace({out}, '^\\s+|\\s+$', '', 'g')"
