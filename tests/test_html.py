"""HTML → text extraction (functions/html.py), JVM-side only."""

from __future__ import annotations

from pyspark.sql import functions as F

from archive_to_parquet_spark.functions.html import (
    html_links,
    html_title,
    html_to_text,
)


def _extract(spark, html: str) -> dict:
    row = (
        spark.createDataFrame([(html,)], ["page"])
        .select(
            html_to_text("page").alias("text"),
            html_title("page").alias("title"),
            html_links("page").alias("links"),
        )
        .collect()[0]
    )
    return row.asDict()


def test_scripts_styles_comments_removed(spark):
    out = _extract(
        spark,
        "<html><head><style>body{x:1}</style>"
        "<script type='text/javascript'>if (a<b) { alert('hi') }</script>"
        "</head><body>keep<!-- not this -->ing</body></html>",
    )
    assert out["text"] == "keep ing"


def test_block_tags_become_line_breaks(spark):
    out = _extract(
        spark,
        "<p>first para</p><p>second para</p><div>a div</div>"
        "line<br>break<ul><li>item one</li><li>item two</li></ul>",
    )
    assert out["text"].splitlines() == [
        "first para",
        "second para",
        "a div",
        "line",
        "break",
        "item one",
        "item two",
    ]


def test_entities_decoded_in_order(spark):
    # &amp;lt; must decode to the literal "&lt;", NOT to "<" —
    # the &amp; pass runs last for exactly this case
    out = _extract(spark, "<p>a &lt; b &amp;&nbsp;c &amp;lt; d &#39;q&#39;</p>")
    assert out["text"] == "a < b & c &lt; d 'q'"


def test_title_and_links(spark):
    out = _extract(
        spark,
        '<head><title>  My&nbsp;Page </title></head>'
        '<body><a class="x" href="https://a.example/1">one</a>'
        "<a href='https://a.example/2'>two</a></body>",
    )
    assert out["title"] == "My Page"
    assert out["links"] == ["https://a.example/1", "https://a.example/2"]


def test_missing_title_is_null(spark):
    assert _extract(spark, "<body>no title</body>")["title"] is None


def test_whitespace_collapse(spark):
    out = _extract(
        spark,
        "<body>  spaced \t out  <p>  para  </p>\n\n\n<p>tail</p> </body>",
    )
    assert out["text"] == "spaced out\npara\ntail"


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([("<p>x</p>",)], ["page"]).select(
        html_to_text("page").alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
