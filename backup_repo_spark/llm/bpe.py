"""BPE merge learning — the tokenizer-TRAINING step of an LLM data
pipeline (llm_token_count applies a BPE-ish lexer; this learns the merge
table itself).

Classic corpus BPE (Sennrich et al., public algorithm): start from
characters, repeatedly merge the most frequent adjacent symbol pair. Every
iteration is two distributed passes over the word table:

  1. pair counting — explode adjacent symbol pairs, weight by word
     frequency, partial-aggregated groupBy (map-side combine collapses each
     partition to its distinct pairs before the shuffle);
  2. merge application — a pure array transform per word (map-only, no
     shuffle), implemented with an aggregate-lambda left fold that rebuilds
     the symbol array collapsing occurrences of the chosen pair.

The winning pair per round is one 1-row argmax collected to the driver
(ties broken lexicographically — fully deterministic); ``localCheckpoint``
truncates lineage per round, the same iterative-algorithm hygiene as
``graph_pagerank``. At 100 TB the word table is |vocabulary|-sized (far
smaller than the corpus — frequencies were already aggregated), so each
round is one small shuffle + one map-only pass.

The merge sequence is NOT SQL-expressible (iterated argmax-dependent
rewriting), so the driver check is rows-only; exactness is proven in
``tests/test_bpe.py`` against a pure-python reference implementation on
both the real corpus and randomized word sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

N_MERGES = 8


def _pair_counts(words: DataFrame) -> DataFrame:
    """(symbols array, n) -> weighted adjacent-pair counts."""
    pairs = words.select(
        "n",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS a, syms[i + 1] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))


def _apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Collapse every adjacent (a, b) into the single symbol a||b — a left
    fold over the symbol array: append to the accumulator, merging with its
    last element when (last, current) == (a, b). Map-only; every column
    other than ``syms`` passes through. Symbols are SQL-escaped: arbitrary
    corpora contain quotes/backslashes, and an unescaped symbol would be
    expression injection."""
    ea, eb = (s.replace("\\", "\\\\").replace("'", "\\'") for s in (a, b))
    merged = F.expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{ea}' AND s = '{eb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{ea}{eb}')) "
        "ELSE concat(acc, array(s)) END)"
    )
    others = [c for c in words.columns if c != "syms"]
    return words.select(merged.alias("syms"), *others)


@query("llm_bpe_merges")  # rows-only: iterated argmax rewriting is not SQL-expressible
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first N_MERGES BPE merges over the documents corpus.
    Returns (rank, pair, merged_symbol, cnt) — the merge table a tokenizer
    trainer exports. See module docstring for the distributed shape."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.expr("split(w, '')").alias("syms"), "n")
        .localCheckpoint()
    )
    out = []
    for rank in range(1, N_MERGES + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        out.append((rank, f"{a} {b}", f"{a}{b}", int(cnt)))
        words = _apply_merge(words, a, b).localCheckpoint()
    return spark.createDataFrame(
        out, "rank INT, pair STRING, merged STRING, cnt BIGINT"
    )


@query("llm_bpe_encode")  # rows-only: iterative merge application (see tests/test_bpe.py)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table — the tokenizer ENCODE step: every
    word decomposes to characters, then the N_MERGES merges replay in
    training order (each one map-only; the merge table is driver-side,
    ~bytes). Reports per-language token statistics of the encoded corpus:
    tokens-per-word falls as merges apply, which is the compression a
    tokenizer buys. Exactness vs a pure-python reference is proven in
    tests/test_bpe.py (not SQL-expressible)."""
    d = load_table(spark, sf_dir, "documents")
    merges = [
        (r.pair.split(" ")[0], r.pair.split(" ")[1])
        for r in llm_bpe_merges(spark, sf_dir).orderBy("rank").collect()
    ]
    enc = (
        d.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.expr("split(w, '')").alias("syms"), "lang", "n")
    )
    for a, b in merges:
        enc = _apply_merge(enc, a, b)
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("words"),
            F.sum(F.size("syms") * F.col("n")).cast("bigint").alias("bpe_tokens"),
            F.round(
                F.sum(F.size("syms") * F.col("n")) / F.sum("n"), 4
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )
