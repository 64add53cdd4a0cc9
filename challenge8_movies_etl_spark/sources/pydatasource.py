"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the modern extension point for sources Spark has no built-in reader
for (internal services, bespoke formats, synthetic generators).

`SynthCorpusDataSource` is a deterministic document-corpus generator
registered as ``spark.read.format("synthcorpus")``:

- **partition planning**: the id range splits into ``numPartitions``
  contiguous slices (one InputPartition each), so generation runs
  executor-parallel — at 100 TB-equivalent volumes the driver only
  plans ranges, it never touches rows;
- **filter pushdown** (``pushFilters``): range predicates on doc_id
  (>, >=, <, <=, =) are absorbed into the planned slices — partitions
  whose range cannot match are never scheduled, the Python-source
  analog of parquet min/max pruning.  Unsupported filters are
  returned to Spark and evaluated post-scan, per the API contract;
- **deterministic content**: every column is closed-form in doc_id,
  so tests can assert exact values, not just counts.

This demonstrates the full source-extension surface; real
deployments swap `_row` for an API/file fetch and keep the
partition-planning + pushdown skeleton unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_LANGS = ("en", "de", "fr", "es", "it")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.lo = 0                  # inclusive bound after pushdown
        self.hi = self.n_docs - 1    # inclusive

    def pushFilters(self, filters):
        for f in filters:
            bound = None
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                              LessThan, LessThanOrEqual)) \
                    and f.attribute == ("doc_id",) \
                    and isinstance(f.value, int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value - 1)
                else:
                    self.hi = min(self.hi, f.value)
                bound = f
            if bound is None:
                yield f  # not handled here — Spark evaluates it

    def partitions(self):
        # contiguous slices of the ORIGINAL range, pruned against the
        # pushed bounds — the min/max-skip shape of a columnar scan
        step = -(-self.n_docs // self.n_parts)
        out = []
        for s in range(0, self.n_docs, step):
            e = min(s + step, self.n_docs) - 1
            if e < self.lo or s > self.hi:
                continue  # provably no matching doc_id — never scheduled
            out.append(_RangePartition(max(s, self.lo), min(e, self.hi)))
        # Spark requires >= 1 partition; an empty range reads no rows
        return out or [_RangePartition(0, -1)]

    def read(self, partition):
        for d in range(partition.start, partition.end + 1):
            yield (d,
                   f"synthetic document {d} body {'word ' * (d % 7 + 1)}"
                   .rstrip(),
                   _LANGS[d % len(_LANGS)],
                   d % 97)

    @staticmethod
    def expected_row(d: int):
        """Closed form for tests."""
        return (d,
                f"synthetic document {d} body {'word ' * (d % 7 + 1)}"
                .rstrip(),
                _LANGS[d % len(_LANGS)],
                d % 97)


class SynthCorpusDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthcorpus"

    def schema(self):
        return ("doc_id bigint, text string, lang string, "
                "quality_bucket bigint")

    def reader(self, schema):
        return SynthCorpusReader(self.options)

    def streamReader(self, schema):
        return SynthCorpusStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('synthcorpus')."""
    spark.dataSource.register(SynthCorpusDataSource)


class SynthCorpusStreamReader(DataSourceStreamReader):
    """`DataSourceStreamReader` for the same synthetic corpus — the
    Spark 4 STREAMING source-extension surface. Offsets are row ids:
    `latestOffset` advances by `batch_rows` per micro-batch until
    `n_docs`, `partitions(start, end)` splits each micro-batch range
    into executor-parallel slices, and exactly-once delivery falls out
    of the offset bookkeeping (the engine checkpoints the committed
    offset; replay after failure re-reads the same deterministic
    range). Real deployments swap the closed-form row for a poll of
    an external system and keep the offset/partition skeleton."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))
        self.n_parts = int(options.get("numPartitions", 4))
        self._current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._current = min(self._current + self.batch_rows, self.n_docs)
        return {"offset": self._current}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        n = max(1, self.n_parts)
        step = max(1, (hi - lo + n - 1) // n)
        return [_RangePartition(s, min(s + step - 1, hi - 1))
                for s in range(lo, hi, step)]

    def read(self, partition):
        for d in range(partition.start, partition.end + 1):
            yield SynthCorpusReader.expected_row(d)

    def commit(self, end):
        pass

    def stop(self):
        pass
