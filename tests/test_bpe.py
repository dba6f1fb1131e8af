"""BPE-merge vocabulary training (engine/bpe, r5 — VERDICT r4 #8): the
DataFrame trainer's merge sequence equals the pure-Python twin on unit
corpora (iterated rounds), round 1 agrees with the oracled registry query,
ties break lexicographically, and repeated runs are identical."""

from __future__ import annotations

import pytest

from engine import bpe

pytestmark = pytest.mark.usefixtures("spark")

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low and newer and lower still",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_bpe_leaves_no_persisted_frames(spark):
    """r6 leak fix: every per-round local checkpoint (which IS a persisted
    RDD) must be released before train_bpe returns — only the plain-Python
    merge list leaves the function, so nothing may stay pinned in executor
    memory waiting for JVM GC."""
    from tests.test_invariance import _persisted_rdd_ids

    before = _persisted_rdd_ids(spark)
    bpe.train_bpe(_docs(spark, CORPUS), 6)
    leaked = _persisted_rdd_ids(spark) - before
    assert not leaked, f"persisted RDDs leaked: {sorted(leaked)}"


def test_train_bpe_equals_python_twin(spark):
    want = bpe.python_bpe(CORPUS, 12)
    got = bpe.train_bpe(_docs(spark, CORPUS), 12)
    assert got == want
    assert len(got) == 12
    # merges compound: some later merge consumes an earlier merged symbol
    merged_syms = {a + b for _, a, b, _ in got}
    assert any(a in merged_syms or b in merged_syms for _, a, b, _ in got[1:])


def test_tie_break_is_lexicographic(spark):
    """'ab' and 'ba' pairs tie at count 2 -> ('a','b') must win round 1."""
    texts = ["ab ab ba ba"]
    got = bpe.train_bpe(_docs(spark, texts), 1)
    assert bpe.python_bpe(texts, 1) == got
    assert (got[0][1], got[0][2]) == ("a", "b")


def test_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' with merge (a,a): greedy pairing gives [aa, aa], so round 2's
    top pair is (aa, aa) — the fold must not re-consume a just-merged
    symbol as a new left side."""
    texts = ["aaaa aaaa aaaa"]
    got = bpe.train_bpe(_docs(spark, texts), 2)
    assert got == bpe.python_bpe(texts, 2)
    assert (got[0][1], got[0][2]) == ("a", "a")
    assert (got[1][1], got[1][2]) == ("aa", "aa")


def test_early_stop_when_no_pairs_remain(spark):
    texts = ["a b c"]  # single-char words: no adjacent pairs at all
    assert bpe.train_bpe(_docs(spark, texts), 5) == []
    assert bpe.python_bpe(texts, 5) == []


def test_round1_matches_registry_query(spark):
    """The oracled bpe_merge_round1 query's rank-1 row IS the trainer's
    first merge on the same corpus (shared construction, pinned)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    q = em.queries()["bpe_merge_round1"](spark, sf).orderBy("rank").collect()
    assert [int(r["rank"]) for r in q] == list(range(1, 21))
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    first = bpe.train_bpe(docs.select("doc_id", "text"), 1)[0]
    assert (q[0]["sym_a"], q[0]["sym_b"], q[0]["pair_count"]) == (
        first[1],
        first[2],
        first[3],
    )


def test_encode_fold_equals_arrow_twin_and_conserves_chars(spark):
    """Tokenizing with the trained merges: the JVM fold path and the
    Arrow-batched scale path agree exactly, tokens concatenate back to the
    original words (tokenizer-rule newline exclusion aside), and merged
    tokens actually appear."""
    docs = _docs(spark, CORPUS)
    merges = bpe.train_bpe(docs, 8)
    fold = {r["doc_id"]: list(r["tokens"])
            for r in bpe.encode_fold(docs, merges).collect()}
    arrow = {r["doc_id"]: list(r["tokens"])
             for r in bpe.encode_arrow(docs, merges).collect()}
    assert fold == arrow
    for i, text in enumerate(CORPUS):
        assert "".join(fold[i]) == text.replace(" ", "")
    merged_syms = {a + b for _, a, b, _ in merges}
    assert merged_syms & {t for ts in fold.values() for t in ts}

    # zero merges: pure character tokenization
    chars = {r["doc_id"]: list(r["tokens"])
             for r in bpe.encode_fold(docs, []).collect()}
    assert chars[0] == [c for c in CORPUS[0] if c != " "]

    # NULL text: both twins yield NULL tokens (review r5 — the Arrow twin
    # previously tokenized the literal string 'None')
    nulls = spark.createDataFrame(
        [(0, None), (1, "ab ab")], "doc_id long, text string"
    )
    f0 = {r["doc_id"]: r["tokens"] for r in bpe.encode_fold(nulls, merges).collect()}
    a0 = {r["doc_id"]: r["tokens"] for r in bpe.encode_arrow(nulls, merges).collect()}
    assert f0[0] is None and a0[0] is None
    assert list(f0[1]) == list(a0[1])


def test_training_is_deterministic(spark):
    a = bpe.train_bpe(_docs(spark, CORPUS), 6)
    b = bpe.train_bpe(_docs(spark, CORPUS), 6)
    assert a == b


def test_frozen_vocab_reproduces_and_encodes_corpus(spark):
    """VERDICT r6 #6: the committed engine/bpe_vocab.py artifact reproduces
    under the pure-Python twin on its training corpus (train_bpe ==
    python_bpe is pinned above, so the twin is a valid retrain proxy), and
    the frozen-vocab Arrow encode conserves characters corpus-wide while
    actually producing MERGED tokens (sub-saturation: some words stay
    multi-token, some tokens are multi-char)."""
    import duckdb

    from engine.bpe_vocab import MERGES, TRAINED_K, TRAINED_SF

    assert TRAINED_K == len(MERGES) == 64
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('/root/testdata/{TRAINED_SF}"
            "/documents.parquet')"
        ).fetchall()
    ]
    assert bpe.python_bpe(texts, TRAINED_K) == MERGES

    docs = spark.read.parquet(
        f"/root/testdata/{TRAINED_SF}/documents.parquet"
    ).select("doc_id", "text")
    enc = bpe.encode_arrow(docs, MERGES)
    row = enc.selectExpr(
        "sum(aggregate(tokens, 0L, (s, t) -> s + length(t))) AS chars",
        "sum(size(tokens)) AS toks",
        "max(aggregate(tokens, 0L, (s, t) ->"
        " greatest(s, CAST(length(t) AS BIGINT)))) AS longest",
    ).collect()[0]
    want_chars = docs.selectExpr(
        "sum(length(replace(text, ' ', ''))) AS c"
    ).collect()[0]["c"]
    assert row["chars"] == want_chars  # merges rearrange, never drop chars
    assert row["longest"] >= 4  # real multi-char tokens exist
    # sub-saturation: strictly more tokens than words would give
    n_words = docs.selectExpr(
        "sum(size(filter(split(text, ' '), w -> w != ''))) AS n"
    ).collect()[0]["n"]
    assert row["toks"] > n_words
