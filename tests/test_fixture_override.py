"""check.py --fixture-override (VERDICT r9 item 4): the mechanism that
turned q_tfidf_cosine_pairs' sf1.0 dense-fixture not_run exclusion
into a standing hash-checked row on the sparse fixture. The override
must swap BOTH engines' inputs (Spark sf_dir and the oracle's DuckDB
views) for exactly the named query."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*args: str) -> str:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check.py"), *args],
        capture_output=True, text=True, cwd=str(REPO), timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_override_swaps_both_engines():
    # q_agg_distinct at sf0.001 overridden to sf0.01: the PASS line
    # must carry the override fixture, and the row still hash-passes —
    # which can only happen if the ORACLE also read sf0.01 (sf0.001
    # has different per-priority sums).
    out = _run("--sf", "/root/testdata/sf0.001",
               "--fixture-override",
               "q_agg_distinct=/root/testdata/sf0.01",
               "q_agg_distinct", "q_scan_project")
    assert "PASS  q_agg_distinct" in out, out
    assert "(fixture: /root/testdata/sf0.01)" in out, out
    # the non-overridden query ran against --sf unchanged
    assert "PASS  q_scan_project" in out, out
    assert out.count("fixture:") == 1, out


def test_missing_override_dir_is_ignored_loudly():
    out = _run("--sf", "/root/testdata/sf0.001",
               "--fixture-override", "q_agg_distinct=/no/such/dir",
               "q_agg_distinct")
    assert "dir missing, ignored" in out, out
    assert "PASS  q_agg_distinct" in out, out


def _run_expect_fail(*args: str) -> str:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check.py"), *args],
        capture_output=True, text=True, cwd=str(REPO), timeout=600)
    assert proc.returncode == 2, proc.stdout + proc.stderr
    return proc.stdout + proc.stderr


def test_mistyped_override_qid_errors_loudly():
    # r10 ADVICE item 4: a mistyped QID with a valid dir used to be
    # stored and silently never applied — it must now exit 2 loudly
    out = _run_expect_fail(
        "--sf", "/root/testdata/sf0.001",
        "--fixture-override", "q_agg_distnict=/root/testdata/sf0.01",
        "q_agg_distinct")
    assert "unknown query id" in out, out


def test_override_qid_outside_requested_set_errors_loudly():
    out = _run_expect_fail(
        "--sf", "/root/testdata/sf0.001",
        "--fixture-override", "q_agg_distinct=/root/testdata/sf0.01",
        "q_scan_project")
    assert "not" in out and "--qids" in out, out
