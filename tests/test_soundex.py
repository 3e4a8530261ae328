"""Soundex algorithm differential on adversarial words.

fn_soundex_blocking's oracle reimplements Spark's soundex in SQL; the
production vocabulary is benign (31 simple words), so this test feeds the
words that distinguish soundex VARIANTS — h/w transparency ('ashcraft'
A261 vs A226, 'bhb' B000 vs B100), vowel+y resets ('byb', 'tymczak'),
run-collapse through the first letter ('pfb', 'mnm', 'llama'), padding
('a', 'h', 'wu') — and asserts the two implementations still agree.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from backup_repo_spark import registry
from backup_repo_spark.session import TABLES
from backup_repo_spark.testing import compare, hard_problems
from tests.conftest import SF_DIR

HARD_WORDS = [
    "pab", "pfb", "tymczak", "pfister", "robert", "rupert",
    "ashcraft", "ashcroft", "honeyman", "wu", "h", "a", "bob",
    "byb", "bhb", "bwb", "bhab", "bayb", "xyzzy", "llama", "mnm",
    "chwx", "hash", "whale", "czar", "knight", "pneumonia",
    "schwartz", "zzzz", "q",
]


@pytest.fixture(scope="module")
def soundex_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("soundex_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(HARD_WORDS)), pa.int64()),
                "text": HARD_WORDS,
                "lang": ["en"] * len(HARD_WORDS),
                "source": ["test"] * len(HARD_WORDS),
                "n_chars": pa.array([len(w) for w in HARD_WORDS], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def test_soundex_agrees_on_adversarial_words(spark, soundex_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{soundex_dir}/{t}.parquet')"
        )
    sp = registry.QUERIES["fn_soundex_blocking"](spark, soundex_dir).toPandas()
    du = con.execute(registry.ORACLES["fn_soundex_blocking"]).fetchdf()
    con.close()
    problems = hard_problems(compare(sp, du))
    assert not problems, f"soundex diverges: {problems}"
    assert len(sp) == len(HARD_WORDS)
