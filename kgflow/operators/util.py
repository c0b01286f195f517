"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gated_broadcast(df: DataFrame, threshold_rows: int | None) -> DataFrame:
    """Broadcast-hint ``df`` only when it is MEASURED to be small.

    A forced ``F.broadcast`` on a mapping whose size is a function of the
    data (e.g. a dedup cluster mapping — one row per document with a
    verified near-dup, 30-50%% of a template-heavy corpus) is a
    deterministic driver/executor OOM at scale: Spark's broadcast limit
    is 8 GB and the driver must hold the build side. This gate counts at
    most ``threshold_rows + 1`` rows (a bounded ``limit().count()`` — on
    the materialized mappings these operators feed it, that is a cheap
    metadata-sized job) and applies the hint only under the threshold;
    above it (or with ``threshold_rows=None``) the frame is returned
    unhinted and AQE picks the join strategy from runtime sizes.
    """
    if threshold_rows is None:
        return df
    n = df.limit(threshold_rows + 1).count()
    return F.broadcast(df) if n <= threshold_rows else df
