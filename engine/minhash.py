"""MinHash signature / LSH banding expression builders — shared by the batch
registry queries (``__spark_entry__``) and the incremental streaming path
(``engine/streaming.neardedup_stream``), so both compute THE SAME signatures
by construction.

Construction (public MinHash/LSH formulation, cf. Broder '97 / MMDS ch.3):
one md5 per token 3-shingle (first 8 hex → 32-bit int) and 8 universal
multiply-mod hash families ``(h·Aᵢ + Bᵢ) mod P`` with P prime > 2³²;
signatures are per-row ARRAY expressions — no explode, no window, zero
Exchange. Banding: 4 bands × 2 rows exploded from an in-row
``array(struct(band, key))`` (single-scan discipline, VERDICT r2 #1).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

P = 4294967311  # smallest prime > 2^32
A = [
    (int(hashlib.md5(f"mh:a:{i}".encode()).hexdigest()[:8], 16) % (2**29 - 1)) | 1
    for i in range(8)
]
B = [int(hashlib.md5(f"mh:b:{i}".encode()).hexdigest()[:8], 16) for i in range(8)]

N_BANDS = 4
ROWS_PER_BAND = 2

# A degenerate band key shared by B documents emits B² candidate pairs;
# standard practice drops oversized buckets (members are caught by other
# bands or are junk). ONE constant shared by the batch query
# (`__spark_entry__` minhash_lsh_pairs + its DuckDB oracle) and the
# incremental streaming path (ADVICE r3 #1) so both cap identically.
LSH_BUCKET_CAP = 50

# in-row token 3-shingle array over a `toks` array column — the ONE shingle
# construction (r4: also reused by the ngram_jaccard_pairs query, which
# previously rebuilt shingles via posexplode + a window)
SHINGLES_EXPR = (
    "transform(sequence(0, size(toks) - 3), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
)

# per-shingle 32-bit hash array over a `toks` array column
HS_EXPR = (
    f"transform({SHINGLES_EXPR}, "
    "s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
)


def sig_col_exprs(src: str = "hs") -> list[str]:
    """The 8 per-family minimum expressions (aliased sig0..sig7)."""
    return [
        f"array_min(transform({src}, h -> (h * {A[i]} + {B[i]}) % {P})) AS sig{i}"
        for i in range(8)
    ]


def band_struct_exprs() -> str:
    """In-row array(struct(band, key)) over sig0..sig7 for single-scan
    banding (explode this instead of UNION-ing per-band scans)."""
    return ", ".join(
        f"named_struct('band', {b}, 'key', "
        f"CAST(sig{ROWS_PER_BAND * b} AS STRING) || ':' || "
        f"CAST(sig{ROWS_PER_BAND * b + 1} AS STRING))"
        for b in range(N_BANDS)
    )


def signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, text) -> (doc_id, sig0..sig7). Shuffle-free: scan → project.
    Docs with fewer than 3 tokens have no shingles and are dropped (they
    cannot near-duplicate anything under this scheme)."""
    toks = df.selectExpr(f"{id_col} AS doc_id", f"split({text_col}, ' ') AS toks")
    hs = toks.where("size(toks) >= 3").selectExpr("doc_id", f"{HS_EXPR} AS hs")
    return hs.selectExpr("doc_id", *sig_col_exprs())


def bands(sig_df: DataFrame) -> DataFrame:
    """(doc_id, sig0..7) -> (doc_id, band, key): tiny banded key rows."""
    return sig_df.selectExpr(
        "doc_id", f"explode(array({band_struct_exprs()})) AS bk"
    ).selectExpr("doc_id", "bk.band AS band", "bk.key AS key")
