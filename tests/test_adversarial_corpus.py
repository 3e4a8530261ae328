"""Adversarial-corpus differential tests.

The sf0.001/sf0.01 corpora are well-formed synthetic text; the
text-processing keys' trickiest branches (empty documents, single-token
documents, same-symbol runs, exact duplicates, substring containment,
whitespace runs) never fire there. This harness builds a tiny documents
table that is NOTHING BUT those cases, stages it as a parquet sf_dir
(other tables symlinked from sf0.001), and runs the fragile
document-processing keys through the SAME Spark-vs-DuckDB comparison the
driver uses. A divergence here is a real cross-engine semantics bug that
the clean corpora would hide.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from backup_repo_spark import registry
from backup_repo_spark.session import TABLES
from backup_repo_spark.testing import compare, hard_problems
from tests.conftest import SF_DIR

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "empty"),                                   # empty doc
    (1, "x", "en", "tiny"),                                   # single char
    (2, "one", "en", "tiny"),                                 # single token
    (3, "two tokens", "en", "tiny"),                          # below shingle width
    (4, "a a a a a", "en", "runs"),                           # odd same-symbol run
    (5, "a a a a a a", "en", "runs"),                         # even run
    (6, "ab ab ab ab", "en", "runs"),                         # overlapping chain
    (7, "the quick brown fox jumps over the lazy dog", "en", "plain"),
    (8, "the quick brown fox jumps over the lazy dog", "en", "dup"),     # exact dup
    (9, "quick brown fox jumps over", "en", "sub"),           # substring of 7
    (10, "the the the quick quick brown", "en", "rep"),       # repeated words
    (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "de", "plain"),
    (12, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "de", "dup"),
    (13, "z y x w v u t s r q p o n m l k j i h g f e d c b a", "fr", "rev"),
    (14, "mixed CASE Tokens And. punct-uation! here?", "en", "punct"),
    (15, "a b a b a b a b a b a b", "en", "runs"),            # long ab chain
    # unicode: BMP accents, CJK, and an ASTRAL emoji (U+1F600 is a
    # surrogate pair in UTF-16 — probed: Spark split('')/md5/regex are all
    # codepoint-aware and byte-agree with DuckDB, this row pins it)
    (16, "café naïve 你好 \U0001F600 ok", "zh", "uni"),
    (17, "\U0001F600\U0001F600 \U0001F600", "zh", "uni"),     # emoji-only doc
]

# Document-processing keys whose oracles exercise tokenization, shingling,
# windowing, replace-chains, or digest reconstruction — the branch-heavy
# surface. All must hold on the adversarial corpus, not just clean text.
FRAGILE_KEYS = [
    "llm_bpe_merges",
    "llm_bpe_encode",
    "llm_winnowing",
    "llm_span_dedup_rebuild",
    "llm_dup_coverage",
    "llm_lm_score",
    "llm_dedup_exact",
    "llm_dedup_simhash",
    "llm_dedup_simhash_hamming",
    "llm_e2e_curation",
    "llm_token_count",
    "llm_doc_chunk",
    "llm_stopword_topk",
    # round 8: the banded-LSH production family + the curator views over
    # its pair graph — the corpus's exact dups (7/8, 11/12) must surface
    # as jaccard-1.0 pairs, clusters, keepers and per-source drops, and
    # the sub-shingle-width docs (0-6) must vanish from the signature
    # stage identically on both engines.
    "llm_dedup_minhash_banded",
    "llm_dedup_cluster_banded",
    "llm_dedup_survivorship_banded",
    "llm_dup_source_matrix",
    "llm_dedup_drop_rate",
    # round 9: cluster-shape profile over the same component labels — the
    # exact dups must land in csize-2 clusters and every sub-shingle-width
    # doc must count into the singleton row on both engines.
    "llm_dup_cluster_profile",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    """An sf_dir whose documents table is the adversarial corpus; every
    other table symlinks to sf0.001."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_sf")
    # single parquet FILE (like the testdata), not a Spark directory —
    # the oracles' read_parquet() expects a file path
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ADVERSARIAL_DOCS], pa.int64()),
            "text": [r[1] for r in ADVERSARIAL_DOCS],
            "lang": [r[2] for r in ADVERSARIAL_DOCS],
            "source": [r[3] for r in ADVERSARIAL_DOCS],
            "n_chars": pa.array([len(r[1]) for r in ADVERSARIAL_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", FRAGILE_KEYS)
def test_fragile_key_on_adversarial_corpus(name, spark, adv_dir, adv_duck):
    spark_pdf = registry.QUERIES[name](spark, adv_dir).toPandas()
    duck_pdf = adv_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on adversarial corpus: {problems}"


# ---------------------------------------------------------------------------
# Zero-duplicate corpus: every doc unique with a disjoint vocabulary, so the
# banded LSH produces an EMPTY pair graph — the branch the planted-dup
# fixtures never fire (empty matrix, all-zero drop rates, no clusters).

UNIQUE_DOCS = [
    (i, " ".join(f"w{i}t{j}" for j in range(8)), "en", f"src{i % 3}")
    for i in range(9)
]


@pytest.fixture(scope="module")
def nodup_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nodup_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in UNIQUE_DOCS], pa.int64()),
            "text": [r[1] for r in UNIQUE_DOCS],
            "lang": [r[2] for r in UNIQUE_DOCS],
            "source": [r[3] for r in UNIQUE_DOCS],
            "n_chars": pa.array([len(r[1]) for r in UNIQUE_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "llm_dedup_minhash_banded",
        "llm_dup_source_matrix",
        "llm_dedup_drop_rate",
        "llm_dup_cluster_profile",
    ],
)
def test_curator_keys_on_zero_dup_corpus(name, spark, nodup_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{nodup_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, nodup_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on zero-dup corpus: {problems}"
    if name == "llm_dedup_drop_rate":
        # every doc kept: 3 sources, zero drops each, drop_rate exactly 0.0
        assert len(spark_pdf) == 3 and (spark_pdf["n_dropped"] == 0).all()
        assert (spark_pdf["drop_rate"] == 0.0).all()
    elif name == "llm_dup_cluster_profile":
        # no pair graph -> exactly one histogram row: all 9 docs singleton
        assert len(spark_pdf) == 1
        row = spark_pdf.iloc[0]
        assert (row["csize"], row["n_clusters"], row["n_docs"]) == (1, 9, 9)
        assert row["doc_share"] == 1.0
    else:
        assert len(spark_pdf) == 0, f"{name} fabricated pairs on unique docs"


# ---------------------------------------------------------------------------
# Total-collapse corpus: every doc IDENTICAL, the opposite extreme of the
# zero-dup case — one complete-graph component whose every pair lands in the
# same band bucket (the quadratic hot-bucket shape the banded join must
# survive), a single keeper under the min-doc_id rule, near-1 drop rates,
# and a one-row size-N histogram.

COLLAPSE_TEXT = "the same document body repeated across every row verbatim"
COLLAPSE_DOCS = [
    (i, COLLAPSE_TEXT, "en", f"src{i % 3}") for i in range(12)
]


@pytest.fixture(scope="module")
def collapse_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("collapse_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in COLLAPSE_DOCS], pa.int64()),
            "text": [r[1] for r in COLLAPSE_DOCS],
            "lang": [r[2] for r in COLLAPSE_DOCS],
            "source": [r[3] for r in COLLAPSE_DOCS],
            "n_chars": pa.array([len(r[1]) for r in COLLAPSE_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "llm_dedup_minhash_banded",
        "llm_dedup_minhash",
        "llm_dedup_cluster_banded",
        "llm_dedup_survivorship_banded",
        "llm_dup_source_matrix",
        "llm_dedup_drop_rate",
        "llm_dup_cluster_profile",
        "llm_lsh_bucket_stats",
    ],
)
def test_curator_keys_on_total_collapse_corpus(name, spark, collapse_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{collapse_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, collapse_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on total-collapse corpus: {problems}"
    n = len(COLLAPSE_DOCS)
    if name in ("llm_dedup_minhash_banded", "llm_dedup_minhash"):
        # complete graph: every ordered (a<b) pair is a verified jaccard-1 dup
        assert len(spark_pdf) == n * (n - 1) // 2
    elif name == "llm_dedup_survivorship_banded":
        # one component of all N docs, min-doc_id keeper: doc 0 survives
        assert len(spark_pdf) == 1
        row = spark_pdf.iloc[0]
        assert (row["keeper"], row["csize"]) == (0, n)
    elif name == "llm_dedup_drop_rate":
        # 3 sources x 4 docs; only src0 keeps its doc 0 -> drops 3/4;
        # src1/src2 drop everything
        assert len(spark_pdf) == 3
        by_src = dict(zip(spark_pdf["source"], spark_pdf["n_dropped"]))
        assert by_src == {"src0": 3, "src1": 4, "src2": 4}
    elif name == "llm_dup_cluster_profile":
        # one cluster of size N, zero singletons
        assert len(spark_pdf) == 1
        row = spark_pdf.iloc[0]
        assert (row["csize"], row["n_clusters"], row["n_docs"]) == (n, 1, n)
    elif name == "llm_lsh_bucket_stats":
        # post-collapse join input: ONE representative -> every band holds
        # one 1-doc bucket, zero implied candidate pairs
        assert len(spark_pdf) == 4
        assert (spark_pdf["n_buckets"] == 1).all()
        assert (spark_pdf["max_bucket"] == 1).all()
        assert (spark_pdf["cand_pairs"] == 0).all()


def test_collapse_shrinks_band_input_to_one_representative(spark, collapse_dir):
    """The VERDICT r9 #1 invariant, asserted structurally: on a corpus of N
    identical documents the banded join's INPUT — representatives, their
    shingles, their band rows — carries exactly ONE document, so the
    formerly-quadratic same-bucket candidate mass (N²/2 pairs in one band
    bucket) cannot exist anywhere in the plan. The complete-graph OUTPUT is
    re-created purely by id-level group expansion (asserted value-exact
    against the oracle in the test above)."""
    from backup_repo_spark.llm.dedup import (
        _bands42,
        _banded_rep_pairs,
        _collapse,
        _shingles3,
        _sig8,
    )
    from backup_repo_spark.session import load_table

    d = load_table(spark, collapse_dir, "documents")
    mem, repdocs = _collapse(d)
    assert repdocs.count() == 1
    bands = _bands42(_sig8(_shingles3(repdocs)))
    assert bands.count() == 4  # one representative x 4 bands, not N x 4
    # and the verified representative pair set is EMPTY (one node, no pairs)
    _, rep_pairs, _ = _banded_rep_pairs(d)
    assert rep_pairs.count() == 0
    # membership map still carries all N docs for the expansion
    assert mem.count() == len(COLLAPSE_DOCS)


# ---------------------------------------------------------------------------
# Interleaved-id expansion corpus: a duplicate group whose member ids
# STRADDLE a near-dup partner's id (group {1, 100} identical, doc 2 a
# near-dup of both). The representative pair is (1, 2), but the expanded
# member pair (2, 100) must come out re-ordered as da=2 < db=100 — the
# least/greatest branch of `_expand_rep_pairs` that no other corpus
# exercises (the collapse corpus has one group, the sf corpora's dup
# groups don't straddle their near-dup partners).

STRADDLE_BODY = (
    "spark shuffles the banded candidate pairs across every executor "
    "before the exact jaccard verification pass begins"
)
# near-dup: same text with a two-word tail change (3-shingle Jaccard vs
# STRADDLE_BODY is well above the 0.5 threshold)
STRADDLE_NEAR = (
    "spark shuffles the banded candidate pairs across every executor "
    "before the exact jaccard verification pass completes today"
)
STRADDLE_DOCS = [
    (1, STRADDLE_BODY, "en", "a"),
    (2, STRADDLE_NEAR, "en", "b"),
    (100, STRADDLE_BODY, "en", "c"),   # exact dup of 1, id ABOVE the near-dup
    (200, "unrelated filler text with nothing shared here at all", "en", "d"),
]


@pytest.fixture(scope="module")
def straddle_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("straddle_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in STRADDLE_DOCS], pa.int64()),
            "text": [r[1] for r in STRADDLE_DOCS],
            "lang": [r[2] for r in STRADDLE_DOCS],
            "source": [r[3] for r in STRADDLE_DOCS],
            "n_chars": pa.array([len(r[1]) for r in STRADDLE_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["llm_dedup_minhash_banded", "llm_dedup_cluster_banded",
     "llm_dedup_survivorship_banded", "llm_dup_source_matrix"],
)
def test_expansion_reorders_straddling_member_pairs(name, spark, straddle_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{straddle_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, straddle_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on straddle corpus: {problems}"
    if name == "llm_dedup_minhash_banded":
        pairs = set(zip(spark_pdf["da"], spark_pdf["db"]))
        # (1,100) intra at jaccard 1.0; (1,2) rep pair; (2,100) is the
        # straddling expansion — MUST be ordered 2 < 100, and carry the
        # same verified jaccard as its representative pair (1,2)
        assert pairs == {(1, 2), (1, 100), (2, 100)}
        by = {(r.da, r.db): r.jaccard for r in spark_pdf.itertuples()}
        assert by[(1, 100)] == 1.0
        assert by[(2, 100)] == by[(1, 2)] < 1.0
    elif name in ("llm_dedup_cluster_banded", "llm_dedup_survivorship_banded"):
        # one component {1, 2, 100}, labeled by its minimum (= rep 1)
        assert len(spark_pdf) == 1
        assert spark_pdf.iloc[0]["component"] == 1
        assert spark_pdf.iloc[0]["csize"] == 3


# ---------------------------------------------------------------------------
# Template-family corpus (VERDICT r10 #3): m NEAR-identical variants of one
# template — same boilerplate, ONE token varying mid-document — the duplicate
# shape the exact-dup collapse cannot bound (no two variants share md5(text))
# and the shape that makes an unsalted band bucket quadratic. The fixtures
# above have zero of these; this corpus exists to prove the salt arm
# (llm_dedup_salted_band) actually splits the hot bucket and to measure the
# recall it trades away (llm_lsh_salt_eval), value-exact on both engines.

TEMPLATE_HEAD = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
)
TEMPLATE_TAIL = (
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
N_TEMPLATE = 24
TEMPLATE_DOCS = [
    (i, f"{TEMPLATE_HEAD} v{i} {TEMPLATE_TAIL}", "en", f"src{i % 3}")
    for i in range(N_TEMPLATE)
]


@pytest.fixture(scope="module")
def template_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("template_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in TEMPLATE_DOCS], pa.int64()),
            "text": [r[1] for r in TEMPLATE_DOCS],
            "lang": [r[2] for r in TEMPLATE_DOCS],
            "source": [r[3] for r in TEMPLATE_DOCS],
            "n_chars": pa.array(
                [len(r[1]) for r in TEMPLATE_DOCS], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["llm_dedup_salted_band", "llm_lsh_salt_eval",
             "llm_lsh_bucket_stats", "llm_dedup_minhash_banded"]
)
def test_salt_keys_on_template_family_corpus(name, spark, template_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{template_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, template_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on template corpus: {problems}"
    if name == "llm_lsh_bucket_stats":
        # the diagnostic FIRES: post-collapse (collapse is a no-op here —
        # all 24 texts distinct) at least one band's hottest bucket holds
        # most of the family, implying a near-quadratic candidate mass
        assert int(spark_pdf["max_bucket"].max()) >= N_TEMPLATE // 2
    elif name == "llm_lsh_salt_eval":
        row = spark_pdf.iloc[0]
        # the cap binds: the salted join's largest key group is a small
        # fraction of the unsalted hot bucket (expected ~cap, bounded
        # loosely against salt-hash luck), and candidate mass collapses
        assert row["max_bucket"] >= N_TEMPLATE // 2
        assert row["max_subbucket"] <= 8
        assert row["n_cand_salted"] < row["n_cand"] / 2
        # the recall cost is real, measured, and non-degenerate
        assert 0.0 < row["recall"] < 1.0
        # unsalted verified pairs ~ the full family: the 4x2 banding
        # detects a J~0.73 pair with p = 1-(1-0.73^2)^4 ~ 0.95, so most
        # (not all) of the 276 template pairs are candidates (267 here)
        assert row["n_pairs"] >= 0.9 * (N_TEMPLATE * (N_TEMPLATE - 1) // 2)


def test_salted_pairs_are_subset_of_unsalted(spark, template_dir):
    """Salting only ever REMOVES candidates: every surviving pair must
    appear in the unsalted output with the identical verified jaccard."""
    salted = registry.QUERIES["llm_dedup_salted_band"](
        spark, template_dir
    ).toPandas()
    full = registry.QUERIES["llm_dedup_minhash_banded"](
        spark, template_dir
    ).toPandas()
    sset = {(r.da, r.db): r.jaccard for r in salted.itertuples()}
    fset = {(r.da, r.db): r.jaccard for r in full.itertuples()}
    assert set(sset) < set(fset)  # strict: the template corpus loses pairs
    assert all(fset[k] == v for k, v in sset.items())


def test_salted_equals_unsalted_when_no_bucket_exceeds_cap(spark, straddle_dir):
    """On a corpus whose post-collapse band buckets are all <= cap, the
    salt arm is byte-identical to the shipped unsalted key (n_sub = 1
    everywhere — the sub column is constant 0)."""
    salted = registry.QUERIES["llm_dedup_salted_band"](spark, straddle_dir)
    full = registry.QUERIES["llm_dedup_minhash_banded"](spark, straddle_dir)
    s = sorted(map(tuple, salted.collect()))
    f = sorted(map(tuple, full.collect()))
    assert s == f and len(s) == 3


# ---------------------------------------------------------------------------
# NULL-text corpus (ADVICE r10): md5(NULL) is NULL, so NULL-text documents
# group in _collapse's groupBy but fail the membership equi-join — they are
# intentionally absent from mem/repdocs pair expansion, exactly like
# sub-shingle-width docs. Pin that the whole banded family (and the exact
# key) agrees with DuckDB when NULL texts are present.

NULLTEXT_DOCS = [
    (1, None, "en", "null"),
    (2, None, "en", "null"),          # a NULL-text "duplicate group"
    (3, "the quick brown fox jumps over the lazy dog", "en", "plain"),
    (4, "the quick brown fox jumps over the lazy dog", "en", "dup"),
    (5, "one two", "en", "tiny"),
]


@pytest.fixture(scope="module")
def nulltext_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nulltext_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in NULLTEXT_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in NULLTEXT_DOCS], pa.string()),
            "lang": [r[2] for r in NULLTEXT_DOCS],
            "source": [r[3] for r in NULLTEXT_DOCS],
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in NULLTEXT_DOCS],
                pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["llm_dedup_exact", "llm_dedup_minhash_banded", "llm_dedup_salted_band",
     "llm_incremental_dedup", "llm_incremental_dedup_salted",
     "llm_lsh_bucket_stats"],
)
def test_dedup_keys_on_null_text_corpus(name, spark, nulltext_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nulltext_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, nulltext_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on NULL-text corpus: {problems}"
    if name in ("llm_dedup_minhash_banded", "llm_dedup_salted_band"):
        # the NULL-text group pairs NOWHERE (can't shingle); only the
        # real exact-dup pair (3, 4) survives, at jaccard 1.0
        assert [(r.da, r.db, r.jaccard) for r in spark_pdf.itertuples()] == [
            (3, 4, 1.0)
        ]


def test_salt_plan_frontier_on_template_family(spark, template_dir):
    """The cap planner's frontier must be monotone and non-degenerate on
    the corpus it exists for: raising the cap admits more candidates
    (n_cand_salted non-decreasing), recovers more true pairs (recall
    non-decreasing), and relaxes the straggler bound (max_subbucket
    non-decreasing) — with real spread between the tightest and loosest
    cap, value-exact against DuckDB."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{template_dir}/{t}.parquet')"
        )
    try:
        sp = registry.QUERIES["llm_lsh_salt_plan"](spark, template_dir).toPandas()
        du = con.execute(registry.ORACLES["llm_lsh_salt_plan"]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(sp, du))
    assert not problems, f"llm_lsh_salt_plan diverges on template corpus: {problems}"
    sp = sp.sort_values("cap").reset_index(drop=True)
    assert list(sp["cap"]) == [1, 2, 4, 8, 16]
    assert sp["n_cand_salted"].is_monotonic_increasing
    assert sp["recall"].is_monotonic_increasing
    # max_subbucket is a REALIZED extreme of the salt assignment, not a
    # deterministic function of cap: the cap-c2 assignment is not a
    # coarsening of cap-c1's (salt % n_sub2 vs % n_sub1 are independent
    # modulo draws), so adjacent caps may swap by a hair. What IS
    # guaranteed — and what the planner's straggler column is for — is
    # that the loosest cap's bound dominates the tightest cap's.
    assert sp["max_subbucket"].iloc[-1] >= sp["max_subbucket"].iloc[0]
    # the frontier is real on a hot-bucket family: the tightest cap loses
    # most pairs, the loosest keeps most of them, and n_pairs matches the
    # unsalted verified count the eval key reports
    assert sp["recall"].iloc[0] < 0.5 < sp["recall"].iloc[-1]
    assert (sp["n_pairs"] == sp["n_pairs"].iloc[0]).all()
    assert sp["max_subbucket"].iloc[0] < N_TEMPLATE // 4


# ---------------------------------------------------------------------------
# Template-family-IN-THE-BATCH corpus (VERDICT r11 #2): the nightly
# incremental path's adversarial shape — half the template family is
# already resident in the base corpus (doc_id < 400), tonight's crawl
# batch delivers the other half (doc_id >= 400), plus one exact reprint of
# a base doc. Unsalted, the shared band bucket produces an mi×mb
# candidate blow-up on one key; llm_incremental_dedup_salted bounds it.

BATCH_TEMPLATE_DOCS = (
    # base-resident half of the family: variants v0..v11
    [(i, f"{TEMPLATE_HEAD} v{i} {TEMPLATE_TAIL}", "en", f"src{i % 3}")
     for i in range(12)]
    # two unrelated base docs (band-join bystanders)
    + [(100, "completely unrelated base document about spark engines and "
              "parquet files with nothing shared", "en", "other"),
       (101, "another standalone text mentioning streams watermarks and "
              "checkpoints only once", "en", "other")]
    # tonight's batch: the family's other half, v12..v23
    + [(400 + j, f"{TEMPLATE_HEAD} v{12 + j} {TEMPLATE_TAIL}", "en",
        f"src{j % 3}") for j in range(12)]
    # an exact reprint of base doc 0 (exercises the exact layer + the
    # near-layer exclusion) and one unrelated incoming doc
    + [(412, f"{TEMPLATE_HEAD} v0 {TEMPLATE_TAIL}", "en", "reprint"),
       (413, "fresh incoming document with entirely novel vocabulary "
              "tokens zeta eta theta iota kappa", "en", "other")]
)


@pytest.fixture(scope="module")
def batch_template_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("batch_template_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in BATCH_TEMPLATE_DOCS], pa.int64()),
            "text": [r[1] for r in BATCH_TEMPLATE_DOCS],
            "lang": [r[2] for r in BATCH_TEMPLATE_DOCS],
            "source": [r[3] for r in BATCH_TEMPLATE_DOCS],
            "n_chars": pa.array(
                [len(r[1]) for r in BATCH_TEMPLATE_DOCS], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["llm_incremental_dedup", "llm_incremental_dedup_salted"]
)
def test_incremental_keys_on_batch_template_corpus(name, spark, batch_template_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{batch_template_dir}/{t}.parquet')"
        )
    try:
        spark_pdf = registry.QUERIES[name](spark, batch_template_dir).toPandas()
        duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
    finally:
        con.close()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on batch-template corpus: {problems}"
    byhow = dict(spark_pdf.groupby("how")["doc_id"].count())
    # the exact layer is salt-INDEPENDENT: the reprint is always caught
    exact_rows = spark_pdf[spark_pdf["how"] == "exact"]
    assert list(exact_rows["doc_id"]) == [412]
    assert list(exact_rows["dup_of"]) == [0]
    if name == "llm_incremental_dedup":
        # unsalted: every incoming family member hits the base half
        # (banding at J~0.73 catches each incoming-vs-base pairing with
        # p ~ 0.95 per pair and min() needs only one verified base hit)
        assert byhow.get("near", 0) == 12
    else:
        # salted at cap 2: the hot bucket is split — SOME incoming
        # members lose all their cross-side sub-bucket collisions (the
        # measured recall cost), but the arm is not degenerate either way
        assert 0 < byhow.get("near", 0) < 12


def test_incremental_salted_is_subset_with_consistent_attribution(
    spark, batch_template_dir
):
    """Salting only removes NEAR rows (ADVICE r12: the old name promised
    'identical attribution' the body never checked). The sound invariants
    of the salt mechanism, asserted per layer:

    - exact layer is salt-independent: identical (doc_id, dup_of) tuples;
    - every salted near doc_id also appears as a near row unsalted (the
      salt can only REMOVE candidate hits, never create a near doc);
    - a salted near row's dup_of is >= the unsalted row's dup_of for the
      same doc — min-over-verified-base-hits can only RISE when the
      minimal hit was salted away, never fall or change arbitrarily."""
    unsalted = registry.QUERIES["llm_incremental_dedup"](
        spark, batch_template_dir
    ).toPandas()
    salted = registry.QUERIES["llm_incremental_dedup_salted"](
        spark, batch_template_dir
    ).toPandas()
    u = {(r.doc_id, r.how, r.dup_of) for r in unsalted.itertuples()}
    s = {(r.doc_id, r.how, r.dup_of) for r in salted.itertuples()}
    exact_u = {(d, o) for d, h, o in u if h == "exact"}
    exact_s = {(d, o) for d, h, o in s if h == "exact"}
    assert exact_u == exact_s
    near_u = {d: o for d, h, o in u if h == "near"}
    near_s = {d: o for d, h, o in s if h == "near"}
    assert set(near_s) <= set(near_u)
    for d, o in near_s.items():
        assert o >= near_u[d], (
            f"salted near dup_of for doc {d} fell below the unsalted min "
            f"({o} < {near_u[d]}) — salting must only remove hits"
        )


def test_jaccard_verify_matches_exploded_form(spark, template_dir, adv_dir):
    """The r13 array-intersect `_jaccard_verify` (guide §2.3/§2.4 — no
    pair x shared-shingle intermediate, no sizes groupBy) must produce
    BIT-identical rows to the exploded-join form the DuckDB oracles
    spell: both arrays are distinct, so size(array_intersect) is the
    same integer the (doc_id, sh) equi-join counts, and i*1.0/(na+nb-i)
    over equal integers is the same double. Asserted on the template
    family (real near-dup pairs across hot buckets) and the adversarial
    corpus (empty/tiny/dup/unicode docs), unrounded doubles compared
    exactly."""
    from backup_repo_spark.llm.dedup import (
        _bands42,
        _collapse,
        _jaccard_verify,
        _shingles3,
        _sig8,
    )
    from backup_repo_spark.session import load_table
    from pyspark.sql import functions as F

    for sdir in (template_dir, adv_dir):
        d = load_table(spark, sdir, "documents")
        _, repdocs = _collapse(d)
        shingles = _shingles3(repdocs)
        a, b = _bands42(_sig8(shingles)).alias("a"), _bands42(
            _sig8(shingles)
        ).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .distinct()
        )
        # exploded reference form (the oracle's shape), inline
        sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        inter = (
            cand.join(shingles.alias("sa"), F.col("da") == F.col("sa.doc_id"))
            .join(
                shingles.alias("sb"),
                (F.col("db") == F.col("sb.doc_id"))
                & (F.col("sa.sh") == F.col("sb.sh")),
            )
            .groupBy("da", "db")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
        exploded = (
            inter.join(sizes.alias("sa"), F.col("da") == F.col("sa.doc_id"))
            .join(sizes.alias("sb"), F.col("db") == F.col("sb.doc_id"))
            .filter(jac >= 0.5)
            .select("da", "db", jac.alias("jaccard"))
        )
        ref = {(r.da, r.db, r.jaccard) for r in exploded.collect()}
        got = {(r.da, r.db, r.jaccard) for r in _jaccard_verify(cand, repdocs).collect()}
        assert got == ref, (
            f"array verify diverges from exploded form at {sdir}: "
            f"only-exploded={sorted(ref - got)[:5]} only-array={sorted(got - ref)[:5]}"
        )
        if sdir == template_dir:
            # the template family must yield real pairs — a silently empty
            # candidate set would make the equivalence vacuous
            assert ref, "equivalence test vacuous: template corpus has no pairs"
