"""Physical-perturbation fixture generator (VERDICT r10 item 3).

The only real bugs of rounds 9 and 10 (arrival-order folds; the
q_stream_cdc_apply chunk-boundary fold) were invisible at every driver
scale and surfaced ONLY because the sf1.0 scalegen fixtures happen to
be physically unsorted — a side effect, not a gate. This tool makes
physical perturbation a first-class sweep mode: it rewrites a fixture
directory with IDENTICAL logical content but hostile physics, and the
ordinary oracle gate (tools/check.py --sf <out>) then runs both
engines over the same perturbed files, so any operator whose result
depends on row order, file order, or Arrow batch boundaries diverges
from its order-independent oracle and turns red.

Three perturbations, all deterministic in --seed:

- row-order shuffle: a seeded permutation of every table's rows — the
  generalized form of the r9 arrival-order catch (no engine may rely
  on ts-sorted input);
- hostile file boundaries: each table is split into multiple files of
  UNEVEN, prime-ish sizes (including a 7-row runt first chunk) — the
  generalized q_stream_cdc_apply chunk-permutation test (streaming
  replay triggers, mapInPandas batch edges, per-file footer paths all
  see pathological splits);
- shuffled file order: chunk file NAMES are permuted relative to
  content so lexicographic listing order != logical order (Spark's
  scan order is listing order; nothing may depend on it).

Row groups are written at an odd size (611) so Arrow batch boundaries
inside each file are also hostile.

Usage:
  python tools/perturb.py [--src /root/testdata/sf0.1] \
      [--out /root/spill/perturb_sf01] [--seed 11]
Then:
  python tools/check.py --sf /root/spill/perturb_sf01 \
      --json PERTURB_RUN_r11.json
"""

from __future__ import annotations

import argparse
import random
import time
from pathlib import Path

import pyarrow.parquet as pq

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

# uneven chunk-size cycle: a runt first file, then prime-ish sizes so
# no boundary ever aligns with a round batch size
_CHUNK_CYCLE = (7, 997, 3001, 613, 4999, 1811)
_ROW_GROUP = 611


def perturb_table(src: Path, out_dir: Path, seed: int) -> int:
    t = pq.read_table(src)
    n = t.num_rows
    rng = random.Random((seed, src.stem).__repr__())
    idx = list(range(n))
    rng.shuffle(idx)
    t = t.take(idx)

    # split into hostile chunks
    sizes = []
    pos = 0
    k = 0
    while pos < n:
        s = min(_CHUNK_CYCLE[k % len(_CHUNK_CYCLE)], n - pos)
        sizes.append(s)
        pos += s
        k += 1
    # shuffled file order: content chunk i gets file index perm[i]
    perm = list(range(len(sizes)))
    rng.shuffle(perm)
    out_dir.mkdir(parents=True, exist_ok=True)
    pos = 0
    for i, s in enumerate(sizes):
        chunk = t.slice(pos, s)
        pos += s
        pq.write_table(chunk, out_dir / f"part-{perm[i]:05d}.parquet",
                       row_group_size=_ROW_GROUP)
    return len(sizes)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/spill/perturb_sf01")
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    src = Path(args.src)
    out = Path(args.out)
    for tbl in TABLES:
        t0 = time.time()
        n_files = perturb_table(src / f"{tbl}.parquet",
                                out / f"{tbl}.parquet", args.seed)
        print(f"{tbl}: {n_files} hostile chunks [{time.time()-t0:.1f}s]")
    print(f"perturbed fixture at {out} (seed {args.seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
