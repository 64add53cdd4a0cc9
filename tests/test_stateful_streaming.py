"""Stateful streaming surface (SURVEY.md §2.J rows-only items):
dropDuplicatesWithinWatermark and a custom applyInPandasWithState
operator, both driven by real micro-batch replays."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.sources.fixtures import load_table
from challenge8_movies_etl_spark.streaming.replay import replay_events_stream
from challenge8_movies_etl_spark.streaming.stateful import running_user_counter
from tests.conftest import SF_SMOKE


def test_stateful_running_counter(spark):
    stream = replay_events_stream(spark, SF_SMOKE)
    counted = running_user_counter(stream)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (counted.writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["user_id"]: (r["n_events"], r["last_ts"])
           for r in spark.table(name).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    want = {r["user_id"]: (r["n"], r["last_ts"])
            for r in e.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
            .collect()}
    assert got == want and len(got) > 0


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Duplicate event_ids arriving inside the watermark horizon are
    dropped by the streaming stateful dedup."""
    import datetime as dt
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(1, base, 1, "click"), (2, base + dt.timedelta(minutes=1), 1, "view"),
            (1, base + dt.timedelta(minutes=2), 1, "click"),   # dup id=1
            (3, base + dt.timedelta(minutes=3), 2, "click"),
            (2, base + dt.timedelta(minutes=4), 1, "view")]    # dup id=2
    src = tmp_path / "dupsrc"
    src.mkdir()
    (spark.createDataFrame(rows, "event_id bigint, ts timestamp, "
                           "user_id bigint, event_type string")
     .coalesce(1).write.mode("overwrite").parquet(str(src / "b0.parquet")))
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .parquet(str(src) + "/*"))
    deduped = (stream.withWatermark("ts", "30 minutes")
               .dropDuplicatesWithinWatermark(["event_id"]))
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.table(name).collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def _protobuf_source() -> str | None:
    """Where a python protobuf runtime can come from on this host.

    transformWithStateInPandas' driver worker speaks protobuf to the
    JVM state server. The container has no python protobuf package and
    pip installs are not allowed, but the host's google-cloud-sdk
    ships the pure-python runtime (public BSD-licensed Google code).
    Returns "site" when importable directly, a staging-source path
    when the SDK copy exists, else None (→ honest skip)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return "site"
    except ImportError:
        pass
    import os
    sdk = ("/usr/lib/google-cloud-sdk/platform/google_appengine"
           "/google/protobuf")
    return sdk if os.path.isdir(sdk) else None


import pytest


@pytest.mark.skipif(_protobuf_source() is None, reason=(
    "transformWithStateInPandas requires a python protobuf runtime; "
    "none is importable and no host copy exists to stage"))
def test_transform_with_state_counter(tmp_path):
    """transformWithStateInPandas (Spark 4 successor API) computes the
    same per-user running counter as the batch aggregate.

    Runs in a SUBPROCESS with its own SparkSession because the shared
    pytest session can't provide what tws needs: (1) a PYTHONPATH
    carrying the staged protobuf runtime (the state-server worker is
    launched by the JVM, whose env is frozen at first-session start),
    (2) protobuf's official TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK
    escape hatch (pyspark's pb2 gencode is 6.33, the host runtime
    6.32-dev — one minor apart, compatible for these messages), and
    (3) the RocksDB state store provider (tws uses multiple column
    families, unsupported by the default HDFS-backed provider)."""
    import os
    import shutil
    import subprocess
    import sys

    src = _protobuf_source()
    env = dict(os.environ)
    env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    if src != "site":
        stage = tmp_path / "pbvendor"
        (stage / "google").mkdir(parents=True)
        shutil.copytree(src, stage / "google" / "protobuf",
                        ignore=shutil.ignore_patterns("blaze-out"))
        (stage / "google" / "__init__.py").write_text(
            "__path__ = __import__('pkgutil')"
            ".extend_path(__path__, __name__)\n")
        env["PYTHONPATH"] = (str(stage) + os.pathsep
                             + env.get("PYTHONPATH", ""))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.streaming.stateStore.providerClass",
                 "org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
         .getOrCreate())
from challenge8_movies_etl_spark.streaming.stateful import (
    running_user_counter_tws)
from challenge8_movies_etl_spark.streaming.replay import (
    replay_events_stream)
from challenge8_movies_etl_spark.sources.fixtures import load_table
stream = replay_events_stream(spark, {SF_SMOKE!r})
q = (running_user_counter_tws(stream).writeStream
     .outputMode("update").format("memory").queryName("tws_eq")
     .trigger(availableNow=True).start())
q.awaitTermination(240)
got = sorted((r["user_id"], r["n_events"], str(r["last_ts"]))
             for r in spark.table("tws_eq").collect())
e = load_table(spark, {SF_SMOKE!r}, "events")
want = sorted((r["user_id"], r["n"], str(r["last_ts"]))
              for r in e.groupBy("user_id")
              .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
              .collect())
assert got == want and len(got) > 0, (got[:3], want[:3])
print("TWS_EQUIVALENCE_OK", len(got))
"""
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=420)
    assert "TWS_EQUIVALENCE_OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])


def test_cdc_fold_is_delivery_order_independent():
    """The CDC materializer's live row is last-writer-wins by
    (ts, event_id) carried in state — NOT arrival order. Arrow chunk
    boundaries ignore event time (the sf1.0 fixture file is not
    ts-sorted, which broke the arrival-order first version), so the
    fold must produce the identical snapshot under any permutation of
    chunk delivery."""
    import pandas as pd

    from challenge8_movies_etl_spark.streaming.stateful import _cdc_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    rows = pd.DataFrame({
        "ts": pd.to_datetime([3, 1, 5, 2, 4], unit="s"),
        "event_id": [30, 10, 50, 20, 40],
        "op": ["U", "I", "D", "U", "U"],
        "v_c": [300, 100, 0, 200, 400],
    })
    # final op by event time is the t=5 DELETE regardless of chunking
    import itertools
    snapshots = []
    for perm in itertools.permutations(range(0, 5, 2)):  # 3 chunkings
        chunks = [rows.iloc[i:i + 2] for i in range(0, 5, 2)]
        order = [chunks[k // 2] for k in perm]
        st = FakeState()
        out = list(_cdc_update((7,), iter(order), st))[0]
        snapshots.append((bool(out["is_live"][0]),
                          out["final_value"][0],
                          int(out["n_ops"][0]),
                          int(out["n_deletes"][0])))
    assert len(set(map(str, snapshots))) == 1, snapshots
    live, val, n, d = snapshots[0]
    assert live is False and n == 5 and d == 1, snapshots[0]
    assert val is None or val != val  # NULL/NaN after the delete
