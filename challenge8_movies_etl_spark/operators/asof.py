"""As-of join operator — the applyInPandas scale path.

The declared/oracle-checked as-of join (queries_joins.q_join_asof) uses
join + max(struct) argmax, which expands the left x right product
before aggregating — fine when right rows per key are few. This module
is the alternative for dense right sides / wide payloads: cogroup both
sides by key (one shuffle each), then pd.merge_asof per group — sort +
binary search, linear in group size, no row expansion. Identical
semantics: latest right row with r_ts <= l_ts per key, backward,
exact matches allowed.

tests/test_operators.py asserts this implementation equals the
join+argmax form on the events fixture.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join_pandas(left: DataFrame, right: DataFrame, key: str,
                     left_ts: str, right_ts: str,
                     right_cols: list[str]) -> DataFrame:
    """merge_asof via cogrouped applyInPandas.

    Output: all left columns + ``right_cols`` (null when no prior right
    row exists for the key).
    """
    lfields = list(left.schema.fields)
    rfields = [f for f in right.schema.fields if f.name in right_cols]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in [*lfields, *rfields]
    )
    lcols = [f.name for f in lfields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[*lcols, *right_cols])
        l = l.sort_values(left_ts).reset_index(drop=True)
        if r.empty:
            out = l.copy()
            for c in right_cols:
                out[c] = None
            return out[[*lcols, *right_cols]]
        # deterministic tie-break: keep the max right id among equal ts
        r = (r[[right_ts, *[c for c in right_cols if c != right_ts]]]
             .sort_values([right_ts, *[c for c in right_cols
                                       if c != right_ts]])
             .reset_index(drop=True))
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts,
            direction="backward", allow_exact_matches=True,
            suffixes=("", "__r"),
        )
        keep = [c if c in out.columns else f"{c}__r" for c in right_cols]
        out = out[[*lcols, *keep]]
        out.columns = [*lcols, *right_cols]
        return out

    return (left.groupBy(key)
            .cogroup(right.groupBy(key))
            .applyInPandas(lambda l, r: merge(l, r), schema=out_schema))
