"""Skew-handling aggregation helpers (north_rule: "salted keys and
AQE-tuned shuffles"; SURVEY §4: one dominant ``source`` carries ~60 % of
rows, so single-key reducers become stragglers).

``salted_agg`` two-phase pattern: pre-aggregate on (group, salt) — the hot
key fans out over S reducers — then re-aggregate on the group. Only valid
for algebraic aggregates (sum/count/min/max), which is exactly the tier
schema, where the re-aggregation is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    n_salts: int = 32,
    salt_col: str = "doc_id",
    value_col: str = "n_tok",
) -> DataFrame:
    """Two-phase skew-safe aggregate producing the tier columns
    (n_tok_sum / row_count / n_tok_min / n_tok_max)."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*group_cols, salt, F.col(value_col))
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(F.col(value_col).cast("long")).alias("_s"),
            F.count(F.lit(1)).alias("_c"),
            F.min(value_col).alias("_mn"),
            F.max(value_col).alias("_mx"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_s").alias("n_tok_sum"),
        F.sum("_c").alias("row_count"),
        F.min("_mn").alias("n_tok_min"),
        F.max("_mx").alias("n_tok_max"),
    )
