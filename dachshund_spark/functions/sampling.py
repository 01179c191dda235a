"""Deterministic per-key sampling for training-data pipelines.

Subsampling is a first-class pipeline operation at 100 TB (per-user event
caps, per-domain document quotas, eval-split carving).  Naive
``df.sample`` is neither per-key nor reproducible across retries; this
module's sample is a pure function of (data, seed):

    rank(row) = row_number over (partition by key
                                 order by md5(seed|id), id)

md5 of the row's stable id is a uniform-looking but deterministic sort
key, so "the k smallest hashes per key" is a uniform-without-replacement
k-sample that every engine reproduces exactly — the same trick the
deterministic walks and Luby MIS use for their "randomness".

Scale shape: one hash-partition exchange on the key columns.  The
``rank <= k`` filter on a row_number window is recognized by Spark's
WindowGroupLimit optimization (3.5+): each partition keeps a running
top-k heap instead of fully sorting — skewed keys (the hub user with
10^8 events) cost O(n log k), not O(n log n), and nothing but the
survivors leaves the map side in the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic uniform-without-replacement sample of ``k``
    rows per distinct ``key_cols`` group.  ``id_col`` must be a stable
    unique row id (it breaks md5 ties and feeds the hash).  Output adds
    ``sample_rank`` (1-based within the group, ordered by the hash)."""
    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
