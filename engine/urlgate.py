"""URL blocklist/allowlist gate — the production DataFrame path behind
the oracled ``url_blocklist_gate`` registry query (r6).

The query demonstrates the gate over synthesized urls with a literal rule
CTE; this module applies the SAME rule semantics to a real ``url`` column
and a runtime rule table:

- rule kinds: ``host`` (exact), ``host_suffix`` (``*.host`` — matches the
  apex too, the standard blocklist-format semantics), ``path_prefix``.
- matching is LITERAL: suffix/prefix tests compare ``right()``/``left()``
  slices, never LIKE over a user pattern — '_' is a LIKE wildcard and a
  legal hostname character (r7 found bug: 'foo_bar.example' under LIKE
  also blocked 'fooXbar.example').
- plan shape: host/path extraction is the JVM ``parse_url`` projection
  (zero shuffle — the url_features construction), and the gate is a
  LEFT ANTI join against the broadcast rule table. The non-equi
  suffix/prefix conditions make it a BroadcastNestedLoopJoin: the
  right plan at any corpus scale, because the build side is the rule
  table (thousands of rows at most) and each corpus partition streams
  through it in place — pinned in tests/test_plans.

Reference analog: the confidence-gate role of F1
(text_detection_yolov8.py:199-202) applied at the URL level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RULE_KINDS = ("host", "host_suffix", "path_prefix")


def rules_df(spark, rules) -> DataFrame:
    """[(kind, pattern), ...] -> a validated one-partition rule frame."""
    bad = sorted({k for k, _ in rules} - set(RULE_KINDS))
    if bad:
        raise ValueError(f"unknown rule kinds {bad}; valid: {RULE_KINDS}")
    return spark.createDataFrame(
        list(rules), "kind string, pattern string"
    ).coalesce(1)


def gate_urls(df: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Rows of ``df`` whose ``url_col`` no rule blocks (LEFT ANTI against
    the broadcast rules). Columns pass through unchanged."""
    host = F.expr(f"lower(parse_url({url_col}, 'HOST'))")
    path = F.expr(f"coalesce(parse_url({url_col}, 'PATH'), '')")
    probe = df.withColumn("_g_host", host).withColumn("_g_path", path)
    # Hosts are case-insensitive (RFC 3986) so host/host_suffix patterns
    # fold to lowercase to match the lowered _g_host; URL *paths* are
    # case-sensitive, so a path_prefix pattern must be kept verbatim —
    # folding '/Admin/' to '/admin/' would silently never match.
    r = rules.select(
        F.col("kind").alias("_g_kind"),
        F.when(F.col("kind") == "path_prefix", F.col("pattern"))
        .otherwise(F.lower("pattern"))
        .alias("_g_pat"),
    )
    # LITERAL prefix/suffix matching via left()/right(), never LIKE with a
    # user pattern (r7 found bug): '_' is a LIKE single-char wildcard AND a
    # legal hostname character, so a rule 'foo_bar.example' under LIKE also
    # blocked 'fooXbar.example' (likewise '%'/'_' in path prefixes).
    cond = F.expr(
        "(_g_kind = 'host' AND _g_host = _g_pat)"
        " OR (_g_kind = 'host_suffix'"
        "     AND (_g_host = _g_pat"
        "          OR right(_g_host, length(_g_pat) + 1) = '.' || _g_pat))"
        " OR (_g_kind = 'path_prefix'"
        "     AND left(_g_path, length(_g_pat)) = _g_pat)"
    )
    return probe.join(F.broadcast(r), cond, "left_anti").drop(
        "_g_host", "_g_path"
    )
