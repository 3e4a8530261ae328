"""Unit tests for bench.py's record parsing, A/B statistic selection and
A/B worktree validation — the pure-python half of the dispersion/A-B
protocol (VERDICT r6 #2, ADVICE r7). No Spark session needed.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

import bench


def test_bench_record_takes_last_json_line_and_skips_noise():
    out = (
        "Using Spark's default log4j profile: ...\n"
        '{"metric": "old", "value": 9.9}\n'
        "some stray stderr-ish line\n"
        '{"metric": "bench_total_best7", "value": 2.8, "median": 3.0}\n'
    )
    rec = bench._bench_record(out)
    assert rec["metric"] == "bench_total_best7"
    assert rec["median"] == 3.0


def test_bench_record_raises_without_json():
    with pytest.raises(RuntimeError):
        bench._bench_record("no json here\nstill none\n")


def test_ab_stat_uses_median_only_when_all_records_stamp_it():
    new = {"value": 2.8, "median": 3.0}
    old = {"value": 2.9}  # pre-round-7 best-of-3 format
    assert bench._ab_stat([new, new]) == "median"
    # mixed formats MUST fall back to value on both sides: best-of-N vs
    # median is the cross-format bias the first --ab smoke run exposed
    assert bench._ab_stat([old, new]) == "value"
    assert bench._ab_stat([old, old]) == "value"


def test_headline_record_contract_fields():
    """The dispersion-stamped record must keep the driver contract fields
    (metric/value/unit/queries/sf) and add runs/median/spread — pinned
    here so a refactor cannot silently drop the dispersion evidence."""
    sample = {
        "metric": f"bench_total_best{bench.PASSES}",
        "value": 2.8,
        "unit": "sec",
        "queries": {m: 0.1 for m in bench.BENCH_QUERIES},
        "sf": 0.1,
        "passes": bench.PASSES,
        "runs": [3.0] * bench.PASSES,
        "median": 3.0,
        "spread": 0.0,
    }
    # shape-check only: json round-trip + required keys
    rec = json.loads(json.dumps(sample))
    for k in ("metric", "value", "unit", "queries", "sf", "runs", "median", "spread"):
        assert k in rec
    assert len(rec["runs"]) == bench.PASSES


def test_disp_best_median_spread():
    """_disp is the per-query dispersion kernel of the TPC-H record
    (VERDICT r7 #2): best=min, median, spread=max-min, all rounded."""
    best, med, spr = bench._disp({"q19": [0.5, 0.49, 2.18, 0.51, 0.55]})
    assert best == {"q19": 0.49}
    assert med == {"q19": 0.51}
    assert spr == {"q19": 1.69}


@pytest.fixture()
def tiny_repo(tmp_path):
    repo = str(tmp_path / "repo")
    os.makedirs(repo)
    def git(*args):
        subprocess.run(["git", "-C", repo, *args], check=True, capture_output=True)
    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    with open(os.path.join(repo, "f.txt"), "w") as fh:
        fh.write("one\n")
    git("add", "f.txt")
    git("commit", "-qm", "c1")
    return repo


def test_ab_worktree_creates_and_reuses_clean(tiny_repo):
    sha = bench._git(tiny_repo, "rev-parse", "--short", "HEAD")
    wt = bench._ab_worktree(tiny_repo, sha)
    assert os.path.isdir(wt) and wt.endswith(f".ab_{sha}")
    assert bench._git(wt, "rev-parse", "HEAD") == bench._git(
        tiny_repo, "rev-parse", sha
    )
    # second call reuses the verified-clean dir (same path, still clean)
    assert bench._ab_worktree(tiny_repo, sha) == wt


def test_ab_worktree_recreates_dirty_or_wrong_checkout(tiny_repo):
    """ADVICE r7: a cached .ab_<sha> left dirty (interrupted run, stray
    edits) must be recreated, not silently benchmarked — local edits on
    the A side would skew the baseline measurements."""
    sha = bench._git(tiny_repo, "rev-parse", "--short", "HEAD")
    wt = bench._ab_worktree(tiny_repo, sha)
    with open(os.path.join(wt, "f.txt"), "w") as fh:
        fh.write("tampered\n")
    wt2 = bench._ab_worktree(tiny_repo, sha)
    assert wt2 == wt
    with open(os.path.join(wt2, "f.txt")) as fh:
        assert fh.read() == "one\n"  # tampering wiped by the recreate
    assert bench._git(wt2, "status", "--porcelain") == ""


def test_ab_worktree_recreates_non_git_dir(tiny_repo):
    """A half-created dir (crash between mkdir and checkout) is not a git
    worktree at all — must be detected and rebuilt, not used. The subtle
    case (ADVICE r8): an EMPTY dir under a repo whose HEAD == sha and
    whose tree is clean passes HEAD/status validation by git's walk-up to
    the parent repo — only a toplevel check catches it, and without the
    rebuild the A-side subprocess dies on the missing checkout files."""
    sha = bench._git(tiny_repo, "rev-parse", "--short", "HEAD")
    stale = os.path.join(tiny_repo, f".ab_{sha}")
    os.makedirs(stale)
    # the trap preconditions hold: parent HEAD == sha, parent tree clean
    assert bench._git(tiny_repo, "rev-parse", "HEAD") == bench._git(
        tiny_repo, "rev-parse", sha
    )
    wt = bench._ab_worktree(tiny_repo, sha)
    # the checkout must actually exist INSIDE the worktree dir
    assert os.path.realpath(
        bench._git(wt, "rev-parse", "--show-toplevel")
    ) == os.path.realpath(wt)
    assert os.path.exists(os.path.join(wt, "f.txt"))
    assert bench._git(wt, "status", "--porcelain") == ""


def test_tpch_report_flags_and_exit(tmp_path, capsys):
    """bench_report --tpch must flag >22x ratios (exit 1) and >1.5x
    cross-round moves, and pass a clean record (exit 0)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "tools"))
    import bench_report

    def rec(path, q1_spark):
        r = {
            "queries": {"q1": q1_spark, "q2": 0.4},
            "duckdb": {"q1": 0.05, "q2": 0.05},
            "spark_median": {"q1": q1_spark, "q2": 0.45},
            "spark_spread": {"q1": 0.1, "q2": 0.1},
            "value": q1_spark + 0.4, "duckdb_total": 0.1,
        }
        p = tmp_path / path
        p.write_text(json.dumps(r))
        return str(p)

    clean = rec("clean.json", 0.3)      # 6x and 8x — under the line
    assert bench_report.tpch_report(clean, None) == 0
    assert "PASS" in capsys.readouterr().out

    hot = rec("hot.json", 1.2)          # q1 at 24x — over the 22x line
    assert bench_report.tpch_report(hot, None) == 1
    assert "over 22x line" in capsys.readouterr().out

    # cross-round move: q1 0.3->0.6 at fixed anchor = 2.0x move, flagged
    # but NOT a failure (probe-first rule), exit stays 0
    moved = rec("moved.json", 0.6)
    assert bench_report.tpch_report(moved, clean) == 0
    assert "moved >1.5x" in capsys.readouterr().out


def test_tpch_record_contract_fields():
    """BENCH_TPCH_r{N}.json must carry BOTH engines' per-query dispersion
    so a ratio flag (the r7 q19/q11 class) is adjudicable from the record
    alone — pinned so a refactor cannot regress to single best-of-3."""
    qs = {m: 0.1 for m in bench.TPCH_QUERIES}
    sample = {
        "metric": f"bench_tpch_total_best{bench.TPCH_PASSES}",
        "value": 2.2, "unit": "sec", "queries": qs, "duckdb": qs,
        "duckdb_total": 2.2, "sf": 0.1, "passes": bench.TPCH_PASSES,
        "runs": [2.2] * bench.TPCH_PASSES, "median": 2.2, "spread": 0.0,
        "spark_median": qs, "spark_spread": qs,
        "duckdb_median": qs, "duckdb_spread": qs,
    }
    rec = json.loads(json.dumps(sample))
    for k in ("queries", "duckdb", "spark_median", "spark_spread",
              "duckdb_median", "duckdb_spread", "runs", "median", "spread"):
        assert k in rec
    assert set(rec["spark_median"]) == set(bench.TPCH_QUERIES)
    # the A/B statistic rule applies unchanged: a tpch record stamps a
    # median, so new-vs-new compares medians, new-vs-r7-format falls back
    assert bench._ab_stat([sample, sample]) == "median"
    assert bench._ab_stat([sample, {"value": 16.1}]) == "value"


def test_tpch_report_prior_flag_and_positional_agree(tmp_path, capsys):
    """--tpch CUR PRIOR and --tpch CUR --prior PRIOR must both work
    (ADVICE r8 / VERDICT r8 #6: the bare-positional-only form crashed on
    the --prior idiom its sibling scale_sweep established)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "tools"))
    import bench_report

    def rec(path, q1):
        r = {
            "queries": {"q1": q1}, "duckdb": {"q1": 0.05},
            "spark_median": {"q1": q1}, "spark_spread": {"q1": 0.1},
            "value": q1, "duckdb_total": 0.05,
        }
        p = tmp_path / path
        p.write_text(json.dumps(r))
        return str(p)

    cur, prior = rec("cur.json", 0.3), rec("prior.json", 0.3)
    assert bench_report.main(["--tpch", cur, prior]) == 0
    out_pos = capsys.readouterr().out
    assert bench_report.main(["--tpch", cur, "--prior", prior]) == 0
    out_flag = capsys.readouterr().out
    assert out_pos == out_flag
    assert "prior" in out_pos  # move column rendered


def test_tpch_report_zero_anchor_and_missing_prior_query(tmp_path, capsys):
    """A 0.000-rounded DuckDB anchor must flag, not ZeroDivisionError; a
    query absent from the prior record skips its move column instead of
    KeyError-aborting the report (ADVICE r8)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "tools"))
    import bench_report

    cur = {
        "queries": {"q1": 0.3, "q_new": 0.2},
        "duckdb": {"q1": 0.0, "q_new": 0.05},
        "spark_median": {"q1": 0.3, "q_new": 0.2},
        "spark_spread": {"q1": 0.0, "q_new": 0.0},
        "value": 0.5, "duckdb_total": 0.05,
    }
    prior = {
        "queries": {"q1": 0.3}, "duckdb": {"q1": 0.05},
        "value": 0.3, "duckdb_total": 0.05,
    }
    pc, pp = tmp_path / "cur.json", tmp_path / "prior.json"
    pc.write_text(json.dumps(cur))
    pp.write_text(json.dumps(prior))
    # q1's 0.0 anchor clamps to 1 ms -> 300x -> legitimately over the line
    assert bench_report.tpch_report(str(pc), str(pp)) == 1
    out = capsys.readouterr().out
    assert "sub-ms DuckDB anchor" in out
    assert "absent from prior record" in out
