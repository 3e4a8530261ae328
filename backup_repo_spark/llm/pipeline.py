"""Training-data pipeline stages beyond dedup/similarity: document
chunking, deterministic dataset splits, PII redaction, stopword filtering.
Not in the reference (Astro predates this workload class, SURVEY.md §2.C);
designed Spark-first for 100 TB corpora.

Scale strategy per operator:
- chunking: map-only (sequence → explode → slice) — no shuffle; output
  partitioning inherits the input, so a downstream tokenizer stage reads
  co-located chunks.
- split: key-hash bucketing (md5), the only split that is reproducible
  across engines, cluster sizes, and task retries — never rand(), which
  resamples on retry and breaks train/test isolation.
- redaction: per-row regexp_replace in the JVM (no Python boundary);
  patterns are RE2-and-Java-regex-compatible so the oracle can verify
  byte-identical output via content hash.
- stopword removal: array lambda filter (JVM higher-order fn), then the
  vocabulary count is a partial-agg-friendly groupBy on the token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

_WINDOW = 64  # tokens per chunk
_STRIDE = 48  # tokens between chunk starts (16-token overlap)


@query(
    "llm_doc_chunk",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    st AS (SELECT doc_id, toks,
                  unnest(generate_series(1, greatest(len(toks), 1), {_STRIDE})) AS s
           FROM tk)
    SELECT doc_id, s AS chunk_start,
           array_to_string(toks[s:s + {_WINDOW - 1}], ' ') AS chunk_text,
           CAST(len(toks[s:s + {_WINDOW - 1}]) AS BIGINT) AS n_tokens
    FROM st
    ORDER BY doc_id, chunk_start
    """,
)
def llm_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 48-token
    stride) — the standard pre-tokenization step for LLM training data.
    Map-only: per doc, generate chunk starts with ``sequence``, explode,
    ``slice`` the token array, rejoin. The trailing chunk may be short
    (both engines clamp the slice identically). At 100 TB this runs with
    zero shuffle and the row expansion (~n_toks/stride per doc) streams
    straight into the next pipeline stage."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(_STRIDE)
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_start"), _WINDOW)
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            "chunk_start",
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_start")
    )


# 256 md5 buckets via the first two hex digits; lowercase fixed-width hex
# compares lexicographically == numerically, so the thresholds are plain
# string comparisons in both engines. 'cc'=204 → 79.7% train, 'e6'=230 →
# 10.2% val, rest test.
_SPLIT_CASE = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         ELSE 'test' END
"""


@query(
    "llm_train_split",
    oracle=f"""
    SELECT {_SPLIT_CASE} AS split, lang, count(*) AS n_docs,
           sum(n_chars) AS total_chars
    FROM documents
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-independent
    key hash (md5 of doc_id). Reproducible across engines, partitionings,
    and task retries — unlike randomSplit(), whose assignment depends on
    partition layout and recomputation. Grouped by (split, lang) so the
    result also audits per-language balance, the thing a real split job
    must report."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    ).alias("split")
    return (
        d.groupBy(split, "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


_EMAIL = "[a-z0-9.]+@[a-z0-9.]+"
_PHONE = "[0-9]{3}-[0-9]{4}"


@query(
    "llm_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL}', '<EMAIL>', 'g'),
                              '{_PHONE}', '<PHONE>', 'g')) AS redacted_hash,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones
    FROM aug
    ORDER BY doc_id
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace email- and phone-shaped spans with typed
    placeholders, counting matches. PII is injected deterministically
    (corpus text is synthetic words) so the redactor has real work; the
    oracle verifies byte-identical output via md5 of the redacted text.
    Patterns restricted to the Java-regex ∩ RE2 common subset. Pure JVM
    regexp_replace — no Python boundary — so at 100 TB this is a map-only
    scan at parquet read speed."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.md5(red).alias("redacted_hash"),
        F.regexp_count(aug, F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE)).cast("long").alias("n_phones"),
    ).orderBy("doc_id")


_STOPWORDS = ["a", "the", "key", "value", "row", "table"]


@query(
    "llm_stopword_topk",
    oracle=f"""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok NOT IN ({", ".join(repr(s) for s in _STOPWORDS)})
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def llm_stopword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal + vocabulary head: filter the token stream through
    a JVM array-lambda (keeps duplicates, unlike array_except), then count
    the surviving vocabulary and keep the top 20 terms. The groupBy is
    partial-agg friendly (token cardinality ≪ token count), and the top-k
    is TakeOrderedAndProject — no global sort. Tiebreak on tok makes the
    LIMIT deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    kept = F.filter(toks, lambda x: ~x.isin(*_STOPWORDS))
    return (
        d.select(F.explode(kept).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@query(
    "llm_source_mixture",
    oracle="""
    WITH c AS (SELECT source, lang, count(*) AS n
               FROM documents GROUP BY source, lang)
    SELECT source, lang, n,
           round(sqrt(n) / (SELECT sum(sqrt(n)) FROM c), 8) AS share
    FROM c ORDER BY source, lang
    """,
)
def llm_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weights: per (source, lang) document counts turned
    into temperature-flattened sampling shares (alpha = 0.5, i.e. sqrt —
    the standard upweighting of low-resource slices when composing a
    training mix). sqrt is IEEE-correctly-rounded, so shares are
    bit-comparable cross-engine (pow(n, 0.7) would not be). The global
    normalizer is a window over the aggregated 100-row mixture table, not
    the corpus — aggregation happens first, so the second pass is
    driver-trivial at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT source, lang, count(*) AS n,
               round(sqrt(count(*)) / sum(sqrt(count(*))) OVER (), 8) AS share
        FROM {d} GROUP BY source, lang ORDER BY source, lang
        """,
        d=d,
    )


@query(
    "llm_contamination",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
               FROM documents),
    sh AS (SELECT doc_id, h, unnest(CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> array_to_string(toks[i:i+7], ' '))
             ELSE [] END) AS shingle FROM t),
    tr AS (SELECT DISTINCT shingle FROM sh WHERE h < 'cc'),
    te AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE h >= 'e6')
    SELECT d.doc_id, count(tr.shingle) AS n_shared,
           count(tr.shingle) > 0 AS contaminated
    FROM (SELECT doc_id FROM t WHERE h >= 'e6') d
    LEFT JOIN te ON d.doc_id = te.doc_id
    LEFT JOIN tr ON te.shingle = tr.shingle
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: for every TEST document (same
    md5-hash split as llm_train_split), count distinct 8-token shingles it
    shares with ANY train document. The canonical eval-leakage audit run
    before training. Scales as shingle-join (shuffle on shingle hash),
    never test×train cross product; the distinct train-shingle set is the
    big side and stays distributed. Docs shorter than 8 tokens contribute
    no shingles (guarded — Spark's sequence() would otherwise count
    backwards)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_cont")
    return spark.sql(
        """
        WITH t AS (SELECT doc_id, split(text, ' ') AS toks,
                          substring(md5(CAST(doc_id AS STRING)), 1, 2) AS h
                   FROM docs_cont),
        sh AS (SELECT doc_id, h, explode(CASE WHEN size(toks) >= 8
                 THEN transform(sequence(1, size(toks) - 7),
                                i -> concat_ws(' ', slice(toks, i, 8)))
                 ELSE array() END) AS shingle FROM t),
        tr AS (SELECT DISTINCT shingle FROM sh WHERE h < 'cc'),
        te AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE h >= 'e6')
        SELECT d.doc_id, count(tr.shingle) AS n_shared,
               count(tr.shingle) > 0 AS contaminated
        FROM (SELECT doc_id FROM t WHERE h >= 'e6') d
        LEFT JOIN te ON d.doc_id = te.doc_id
        LEFT JOIN tr ON te.shingle = tr.shingle
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    )
