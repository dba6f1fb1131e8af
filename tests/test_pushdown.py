"""Stage-1 threshold pushdown (SURVEY §4 O3): with emit_filtered_text=False,
non-kept block text never crosses the Arrow channel, while features and the
final extracted bytes are unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import pipeline


def test_pushdown_drops_filtered_text_keeps_features(spark, pages_unit_path):
    pages = spark.read.parquet(pages_unit_path)
    full = pipeline.detect(pages, num_parts=4, emit_filtered_text=True)
    pushed = pipeline.detect(pages, num_parts=4, emit_filtered_text=False)

    keep = (
        "block_id >= 0 AND NOT (n_chars >= 25 AND n_chars <= 1000000 "
        "AND 3 * n_link_chars < n_chars)"
    )
    # filtered blocks: text emptied under pushdown, but features identical
    assert pushed.filter(keep).filter("text != ''").count() == 0
    assert full.filter(keep).filter("text != ''").count() > 0

    cols = ["url", "block_id", "tag", "n_chars", "n_link_chars", "lang"]
    a = sorted(map(tuple, full.select(*cols).collect()))
    b = sorted(map(tuple, pushed.select(*cols).collect()))
    assert a == b

    # surviving blocks keep their text verbatim
    surv = F.expr(pipeline.KEEP_PREDICATE)
    sa = sorted(map(tuple, full.filter(surv).select("url", "block_id", "text").collect()))
    sb = sorted(map(tuple, pushed.filter(surv).select("url", "block_id", "text").collect()))
    assert sa == sb
