"""Substring-dedup novelty — the production materialize-first shape
(VERDICT r6 #4) behind the oracled ``substring_dedup`` registry query.

The query form builds the gram stream in a CTE referenced twice (the
keeper groupBy and the tally join); Spark inlines CTEs, so the oracled
plan tokenizes and md5-hashes the corpus TWICE (PLANS.md r6: 3 FileScans)
and re-shuffles every digest a second time for the g-join-k tally. Fine
at gate scale; 2x the necessary CPU at 100 TB. This module keeps the
exact semantics but builds the stream ONCE:

- :func:`combined_stream` — a single text scan emits, per doc, every
  (pos, digest) gram row PLUS exactly one ``pos IS NULL`` row for
  gram-less docs, with the in-row ``n_grams`` arithmetic carried along
  (``greatest(size(toks) - K + 1, 0)`` — the tally needs no counting
  pass). Tokenize + hash happen exactly once; gram TEXT never leaves the
  row (digests only).
- :func:`novelty` — checkpoints that stream (tracked, the r6 leak-fix
  discipline), then derives everything from the materialized rows:
  keepers via one partial-agg ``min(struct(doc_id, pos))`` digest
  shuffle, ``n_novel`` by counting keepers per winning doc (one row per
  DISTINCT digest — the query's second digest-wide g-join-k shuffle
  disappears), and the per-doc base from the ``pos IS NULL OR pos = 0``
  rows (every doc with grams has a pos=0 row). Returns ``(df, rdd_ids)``
  — the caller releases via
  :func:`engine.session.release_local_checkpoint` when done, the same
  contract as ``engine.watgraph.domain_rank``.

Pins (tests/test_substrdedup): row-equal to the oracled query; the
stream plan reads ``text`` in exactly ONE FileScan; the derived plan
reads only the checkpoint (zero parquet re-scans); no Window; no per-row
Python.

Reference analog: the C8/Recognizer tally role of
text_recognition_parseq.py:86-118 applied corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.session import local_checkpoint_tracked

K_GRAM = 16


def combined_stream(docs: DataFrame, k: int = K_GRAM) -> DataFrame:
    """(doc_id, n_grams, pos, h) in ONE text scan: every gram position of
    every doc, plus one ``pos IS NULL`` row per gram-less doc so the
    per-doc base never needs a second scan."""
    kk = int(k)
    return (
        docs.selectExpr(
            "doc_id",
            "split(text, ' ') AS toks",
        )
        .selectExpr(
            "doc_id",
            f"greatest(size(toks) - {kk - 1}, 0) AS n_grams",
            "toks",
            # explode_outer keeps gram-less docs as a single NULL-pos row;
            # the CASE guards sequence() against its descending-range
            # behavior when size(toks) < k
            f"explode_outer(CASE WHEN size(toks) >= {kk}"
            f" THEN sequence(0, size(toks) - {kk}) END) AS pos",
        )
        .selectExpr(
            "doc_id",
            "n_grams",
            "pos",
            f"md5(array_join(slice(toks, pos + 1, {kk}), ' ')) AS h",
        )
    )


def novelty(
    docs: DataFrame, k: int = K_GRAM
) -> tuple[DataFrame, list]:
    """(doc_id, n_grams, n_novel, novelty) — row-equal to the oracled
    ``substring_dedup`` query; the corpus is tokenized + hashed once."""
    stream, ids = local_checkpoint_tracked(combined_stream(docs, k))
    keepers = (
        stream.where("pos IS NOT NULL")
        .groupBy("h")
        .agg(F.expr("min(named_struct('d', doc_id, 'p', pos))").alias("kp"))
    )
    novel = keepers.groupBy(F.col("kp.d").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    base = stream.where("pos IS NULL OR pos = 0").select("doc_id", "n_grams")
    out = base.join(novel, "doc_id", "left").selectExpr(
        "doc_id",
        "CAST(n_grams AS BIGINT) AS n_grams",
        "CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel",
        # the query's novelty: NULL (-> 1.0) for gram-less docs, else the
        # same n_novel * 1.0 / n_grams double expression
        "CAST(round(coalesce(coalesce(n_novel, 0) * 1.0"
        " / nullif(n_grams, 0), 1.0), 4) AS DOUBLE) AS novelty",
    )
    return out, ids
