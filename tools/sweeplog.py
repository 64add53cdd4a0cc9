"""Convert a (possibly still-running) tools/check.py sweep log into the
LOCAL_CORRECTNESS JSON record format, optionally merging extra records
from completed --json files.

Why this exists: the sf1.0 full-registry sweep is DuckDB-oracle-bound
(the quadratic-twin oracles — q_dbscan alone measured ~29 min — can
push the wall-clock past a working session), and check.py writes its
--json record only at the END. This tool lets a partially-completed
sweep's finished rows be recorded honestly: the JSON carries
n_not_run and the not-run qid list, so a partial record can never be
mistaken for a full one.

Usage:
  python tools/sweeplog.py SWEEP.log --sf DIR --json OUT.json \\
      [--merge EXTRA.json ...]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

_PASS = re.compile(r"^PASS  (\S+): (\d+) rows")
_ROWS = re.compile(r"^rows  (\S+): (\d+) rows \(rows-only")
_FAIL = re.compile(r"^FAIL  (\S+): (.*)")


def parse_log(path: Path) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for line in path.read_text().splitlines():
        if m := _PASS.match(line):
            out[m.group(1)] = {"status": "pass", "rows": int(m.group(2))}
        elif m := _ROWS.match(line):
            out[m.group(1)] = {"status": "rows_only",
                               "rows": int(m.group(2))}
        elif m := _FAIL.match(line):
            out[m.group(1)] = {"status": "fail", "error": m.group(2)}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", type=Path)
    ap.add_argument("--sf", required=True)
    ap.add_argument("--json", required=True, type=Path)
    ap.add_argument("--merge", nargs="*", type=Path, default=[])
    args = ap.parse_args()

    results = parse_log(args.log)
    for extra in args.merge:
        rec = json.loads(extra.read_text())
        results.update(rec.get("queries", {}))

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    load_all()
    not_run = sorted(set(QUERIES) - set(results))

    n_pass = sum(r["status"] == "pass" for r in results.values())
    n_rows = sum(r["status"] == "rows_only" for r in results.values())
    failures = sorted(q for q, r in results.items()
                      if r["status"] == "fail")
    args.json.write_text(json.dumps({
        "sf_dir": args.sf,
        "n_pass": n_pass, "n_fail": len(failures),
        "n_rows_only": n_rows,
        "failures": failures,
        "n_not_run": len(not_run),
        "not_run": not_run,
        "queries": results,
    }, indent=1) + "\n")
    print(f"{n_pass} pass, {len(failures)} fail, {n_rows} rows-only, "
          f"{len(not_run)} not run -> {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
