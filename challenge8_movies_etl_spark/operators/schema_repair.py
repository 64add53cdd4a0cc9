"""Schema-repair operators — the reference's hand-repair steps
(clean_movie's ~20 change_column_name calls + alt-title folding,
challenge.py≈L10-55 [R]; the <90%-null column prune, ≈L86-88 [R]) as
reusable, data-dependent operators (SURVEY.md §4.1: these stay
operators, not optimizer rules, because the decisions depend on data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def consolidate_columns(df: DataFrame,
                        pairs: dict[str, list[str]]) -> DataFrame:
    """Rename-consolidation: for each canonical name, coalesce the
    variant columns into it and drop the variants — the engine form of
    clean_movie's 'Directed by'→'Director' pile.

    ``pairs``: canonical -> list of variant column names (first
    non-null wins, in order; canonical column itself participates
    first when present).
    """
    out = df
    for canon, variants in pairs.items():
        present = [c for c in variants if c in out.columns]
        srcs = ([F.col(canon)] if canon in out.columns else []) \
            + [F.col(c) for c in present]
        if not srcs:
            continue
        out = out.withColumn(canon, F.coalesce(*srcs) if len(srcs) > 1
                             else srcs[0])
        out = out.drop(*[c for c in present if c != canon])
    return out


def fold_to_map(df: DataFrame, keys: list[str], map_col: str) -> DataFrame:
    """Fold scalar columns into one MapType column (clean_movie's
    alt_titles fold: ~20 language-title keys → one dict)."""
    present = [c for c in keys if c in df.columns]
    kv = []
    for c in present:
        kv.extend([F.lit(c), F.col(c)])
    out = df.withColumn(
        map_col,
        F.map_filter(F.create_map(*kv), lambda _, v: v.isNotNull()),
    )
    return out.drop(*present)


def null_ratio_profile(df: DataFrame) -> dict[str, float]:
    """One aggregate-only pass: null ratio per column. Driver-side
    result is one row of width |columns| — safe at any scale."""
    row = df.agg(*[
        F.avg(F.col(c).isNull().cast("double")).alias(c) for c in df.columns
    ]).collect()[0]
    return {c: float(row[c] or 0.0) for c in df.columns}


def prune_mostly_null(df: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Keep columns with null-ratio < threshold (the reference's
    wiki_columns_to_keep rule, made reusable)."""
    ratios = null_ratio_profile(df)
    keep = [c for c in df.columns if ratios[c] < threshold]
    return df.select(*keep)
