"""Physical-perturbation gate (VERDICT r10 item 3), durable form.

tools/perturb.py rewrites a fixture with identical logical content but
hostile physics: shuffled row order, uneven prime-ish file chunks with
a 7-row runt, file names permuted against content order, odd (611) row
groups. This test perturbs sf0.001 into a tmp dir and runs the most
order-sensitive operator classes through the ordinary oracle gate over
the perturbed files — the generalized, always-on version of the
q_stream_cdc_apply chunk-permutation test that caught the only real
bugs of rounds 9 and 10 (and, on its first full run in round 11, the
q_parquet_footer_stats tie-order bucketing divergence).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# one representative per order-sensitivity class: stateful streaming
# fold, windowed fold, per-user trapezoid over lead(), physical
# file/row-group walk, arrival-order-prone CEP, global rank
_ORDER_SENSITIVE = [
    "q_stream_cdc_apply",
    "q_window_running",
    "q_time_weighted_avg",
    "q_parquet_footer_stats",
    "q_cep_pattern",
    "q_curriculum_order",
]


def test_order_sensitive_queries_survive_hostile_physics(tmp_path):
    out = tmp_path / "perturbed_sf0001"
    gen = subprocess.run(
        [sys.executable, str(REPO / "tools" / "perturb.py"),
         "--src", "/root/testdata/sf0.001", "--out", str(out),
         "--seed", "17"],
        capture_output=True, text=True, cwd=str(REPO), timeout=300)
    assert gen.returncode == 0, gen.stdout + gen.stderr
    # every table must be multi-file with the runt chunk present so
    # the perturbation is actually hostile, not a no-op copy
    ev = sorted((out / "events.parquet").glob("*.parquet"))
    assert len(ev) > 1, "events must split into multiple chunks"
    chk = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check.py"),
         "--sf", str(out), *_ORDER_SENSITIVE],
        capture_output=True, text=True, cwd=str(REPO), timeout=1200)
    assert chk.returncode == 0, chk.stdout[-4000:] + chk.stderr[-2000:]
    assert "0 fail" in chk.stdout, chk.stdout[-4000:]
