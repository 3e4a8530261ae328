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

The merge sequence IS SQL-expressible after all — as a generated chain of
N_MERGES CTE levels (pair-count → argmax → merge-apply), so the driver
check is full-value. The merge-apply trick: represent each word's symbols
as a DOUBLE-space-joined string (``'  a  b  c  '``) and apply one merge as
``replace(s, ' a  b ', ' ab ')``. Each occurrence consumes ONE of the two
separator spaces on each side, so (1) adjacent occurrences never overlap —
plain left-to-right non-overlapping replace pairs up runs exactly like the
greedy left fold (``' a  a  a '`` → ``' aa  a '``, not ``' a  aa '``), and
(2) token boundaries are exact (symbols never contain spaces). Exactness
vs a pure-python reference is additionally proven in ``tests/test_bpe.py``
on the real corpus and randomized word sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

N_MERGES = 8


def _bpe_merge_ctes(n_merges: int) -> str:
    """Shared oracle CTE chain learning ``n_merges`` BPE merges in DuckDB.

    Defines: words (global word frequencies), w0 (double-space symbol
    strings), and per-level t{k} (token explode), p{k} (weighted adjacent
    pair counts), m{k} (argmax pair, ties broken lexicographically —
    identical to the Spark side's orderBy(desc(cnt), a, b)), w{k} (merge
    applied). See module docstring for why replace() == greedy fold."""
    parts = [
        """words AS MATERIALIZED (
      SELECT w, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) > 0 GROUP BY w
    ),
    w0 AS MATERIALIZED (
      SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s, n FROM words
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""t{k} AS MATERIALIZED (
      SELECT n, toks, generate_subscripts(toks, 1) AS i
      FROM (SELECT n, list_filter(string_split(s, '  '), x -> x <> '') AS toks
            FROM w{k - 1})
    ),
    p{k} AS MATERIALIZED (
      SELECT toks[i] AS a, toks[i + 1] AS b, sum(n) AS cnt
      FROM t{k} WHERE i < len(toks) GROUP BY 1, 2
    ),
    m{k} AS MATERIALIZED (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
    w{k} AS MATERIALIZED (
      SELECT replace(s,
               ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',
               ' ' || (SELECT a || b FROM m{k}) || ' ') AS s, n
      FROM w{k - 1}
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_merges_oracle(n_merges: int) -> str:
    rows = "\n      UNION ALL ".join(
        f"SELECT {k} AS rank, a || ' ' || b AS pair, a || b AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_merge_ctes(n_merges)}\n    SELECT * FROM ({rows}) ORDER BY rank"


def _bpe_encode_oracle(n_merges: int) -> str:
    e_levels = []
    for k in range(1, n_merges + 1):
        e_levels.append(
            f"""e{k} AS MATERIALIZED (
      SELECT lang, n, replace(s,
               ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',
               ' ' || (SELECT a || b FROM m{k}) || ' ') AS s
      FROM e{k - 1}
    )"""
        )
    return f"""WITH {_bpe_merge_ctes(n_merges)},
    wl AS MATERIALIZED (
      SELECT lang, w, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) > 0 GROUP BY lang, w
    ),
    e0 AS MATERIALIZED (
      SELECT lang, n, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s FROM wl
    ),
    {",".join(e_levels)},
    enc AS MATERIALIZED (
      SELECT lang, n,
             len(list_filter(string_split(s, '  '), x -> x <> '')) AS n_tok
      FROM e{n_merges}
    )
    SELECT lang, CAST(sum(n) AS BIGINT) AS words,
           CAST(sum(n_tok * n) AS BIGINT) AS bpe_tokens,
           round(sum(n_tok * n) * 1.0 / sum(n), 4) AS tokens_per_word
    FROM enc GROUP BY lang ORDER BY lang"""


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


@query("llm_bpe_merges", oracle=_bpe_merges_oracle(N_MERGES))
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first N_MERGES BPE merges over the documents corpus.
    Returns (rank, pair, merged_symbol, cnt) — the merge table a tokenizer
    trainer exports. See module docstring for the distributed shape and
    for the generated-CTE oracle's replace()-equals-greedy-fold argument."""
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


@query("llm_bpe_encode", oracle=_bpe_encode_oracle(N_MERGES))
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table — the tokenizer ENCODE step: every
    word decomposes to characters, then the N_MERGES merges replay in
    training order (each one map-only; the merge table is driver-side,
    ~bytes). Reports per-language token statistics of the encoded corpus:
    tokens-per-word falls as merges apply, which is the compression a
    tokenizer buys. Full-value oracled via the generated replace-chain CTE
    (module docstring); also proven vs a pure-python reference in
    tests/test_bpe.py."""
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
