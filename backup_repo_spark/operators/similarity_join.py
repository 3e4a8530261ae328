"""Exact string-similarity join via deletion-neighborhood signatures.

Not in the reference; added from the retrieved-paper corpus: the
string-similarity-join family ("Highly Efficient String Similarity Search
and Join over Compressed Indexes", ICDE 2022, PAPERS.md). This implements
the SymSpell/deletion-neighborhood variant for edit distance ≤ 1:

    sig(s) = {s} ∪ { s with one character deleted }
    d(a, b) ≤ 1  ⇒  sig(a) ∩ sig(b) ≠ ∅

so an equi-join on exploded signatures finds a COMPLETE candidate set —
O(n·len) signature rows and a hash-partitionable join key instead of the
O(n²) all-pairs levenshtein a naive similarity join needs. Candidates are
then verified with exact ``levenshtein``. At 100 TB the signature join is
an ordinary shuffle join on short strings; nothing quadratic ever forms.

Signatures are built with JVM higher-order functions (``transform`` over
character positions) — no UDF in the hot path. The oracle is the naive
quadratic join (correct by definition) over the distinct-name domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "join_editdist_symspell",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS n FROM part)
    SELECT a.n AS name_a, b.n AS name_b,
           CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
    FROM names a JOIN names b ON a.n < b.n
    WHERE levenshtein(a.n, b.n) <= 1
    ORDER BY name_a, name_b
    """,
)
def join_editdist_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of distinct part names within edit distance 1, found by
    the deletion-neighborhood signature join (complete by the SymSpell
    theorem), verified with exact levenshtein. Oracle = the naive O(n²)
    join — both produce the same set, which is the point."""
    names = load_table(spark, sf_dir, "part").select(F.col("p_name").alias("n")).distinct()
    # sig index 0 = the string itself; i>0 = delete character i (1-based)
    sigs = names.select(
        "n",
        F.explode(
            F.expr(
                "transform(sequence(0, length(n)), i -> CASE WHEN i = 0 THEN n "
                "ELSE concat(substring(n, 1, i - 1), substring(n, i + 1)) END)"
            )
        ).alias("sig"),
    ).distinct()
    a = sigs.select(F.col("n").alias("name_a"), "sig")
    b = sigs.select(F.col("n").alias("name_b"), "sig")
    cand = (
        a.join(b, "sig")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    d = F.levenshtein("name_a", "name_b")
    return (
        cand.filter(d <= 1)
        .select("name_a", "name_b", d.cast("int").alias("dist"))
        .orderBy("name_a", "name_b")
    )
