"""Exactness tests for BPE merge learning against a pure-python reference
(a third, independent implementation besides the Spark fold and the
generated DuckDB replace-chain oracle)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from backup_repo_spark.llm.bpe import N_MERGES, _apply_merge, _pair_counts
from backup_repo_spark.session import load_table
from tests.conftest import SF_DIR


def _bpe_ref(word_counts: dict[str, int], k: int):
    """Reference BPE: list-of-symbols words, lexicographic tie-break."""
    words = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, f"{a} {b}", f"{a}{b}", cnt))
        new_words = {}
        for syms, n in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def _corpus_counts(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = (
        d.selectExpr("explode(split(text, ' ')) AS w")
        .filter("length(w) > 0")
        .groupBy("w")
        .count()
        .collect()
    )
    return {r.w: r["count"] for r in rows}


def test_bpe_merges_match_reference_on_corpus(spark):
    from backup_repo_spark import registry

    got = [
        (r.rank, r.pair, r.merged, r.cnt)
        for r in registry.QUERIES["llm_bpe_merges"](spark, SF_DIR).collect()
    ]
    want = _bpe_ref(_corpus_counts(spark), N_MERGES)
    assert got == want


words_strategy = st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words_strategy)
def test_bpe_steps_match_reference_on_random_words(spark, wc):
    import pyspark.sql.functions as F

    words = spark.createDataFrame(
        [(list(w), n) for w, n in wc.items()], "syms ARRAY<STRING>, n LONG"
    )
    got = []
    for rank in range(1, 4):
        top = _pair_counts(words).orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        got.append((rank, f"{a} {b}", f"{a}{b}", int(cnt)))
        words = _apply_merge(words, a, b)
    assert got == _bpe_ref(wc, 3)


def test_bpe_encode_matches_reference_on_corpus(spark):
    """Encoded-corpus token totals must equal applying the reference
    merges to the reference word counts."""
    from backup_repo_spark import registry
    from backup_repo_spark.llm.bpe import N_MERGES

    got = {
        r.lang: (r.words, r.bpe_tokens)
        for r in registry.QUERIES["llm_bpe_encode"](spark, SF_DIR).collect()
    }
    # reference: per-lang word counts, then replay the corpus-level merges
    d = load_table(spark, SF_DIR, "documents")
    rows = (
        d.selectExpr("lang", "explode(split(text, ' ')) AS w")
        .filter("length(w) > 0")
        .groupBy("lang", "w")
        .count()
        .collect()
    )
    merges = _bpe_ref(_corpus_counts(spark), N_MERGES)
    pairs = [tuple(m[1].split(" ")) for m in merges]
    want = {}
    for r in rows:
        syms = list(r.w)
        for a, b in pairs:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        w_cnt, t_cnt = want.get(r.lang, (0, 0))
        want[r.lang] = (w_cnt + r["count"], t_cnt + len(syms) * r["count"])
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(words_strategy)
def test_duckdb_oracle_replace_chain_matches_reference(wc):
    """The generated DuckDB oracle's merge-apply is a plain replace() over
    a double-space token encoding — prove on random word multisets that
    this equals the greedy left-fold reference, including the adversarial
    cases (odd same-symbol runs 'aaa', overlapping chains 'abab')."""
    import duckdb

    from backup_repo_spark.llm.bpe import _bpe_merges_oracle

    con = duckdb.connect()
    docs = [(" ".join([w] * n),) for w, n in wc.items()]
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", docs)
    got = [tuple(r) for r in con.execute(_bpe_merges_oracle(8)).fetchall()]
    want = _bpe_ref(wc, 8)
    assert got == want


def test_duckdb_oracle_replace_chain_adversarial_cases():
    """Pin the exact strings the double-space replace trick must get right."""
    import duckdb

    from backup_repo_spark.llm.bpe import _bpe_merges_oracle

    for corpus in (
        {"aaaaa": 3},          # odd same-symbol run: pairs up left-to-right
        {"ababab": 2},         # overlapping chain, all pairs merge
        {"aab": 5, "abb": 4},  # fold blocking on left/right
        {"aaab": 2, "ba": 7},
    ):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?)",
            [(" ".join([w] * n),) for w, n in corpus.items()],
        )
        got = [tuple(r) for r in con.execute(_bpe_merges_oracle(8)).fetchall()]
        assert got == _bpe_ref(corpus, 8), corpus
