"""Record linkage (entity resolution) across tables: blocked candidate
generation + Fellegi–Sunter-style additive agreement weights.

The pattern is the capability (Fellegi & Sunter 1969): candidate pairs
come ONLY from a blocking key (never a cross product), each compared
field contributes a log-likelihood-style integer weight (agreement
earns, disagreement costs), and candidates above a threshold rank per
left entity. At 100 TB the block key bounds pair fan-out exactly like
q20's interval bucket — per-key pairs are block-local, and the join is
an equi-join on the block.

Weights here are fixed small integers (demo-calibrated, deterministic);
a production deployment estimates them with EM over labeled pairs and
plugs them into the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    left_id: str,
    right_id: str,
    name_cols: tuple[str, str],
    bal_cols: tuple[str, str],
    min_score: int = 2,
    k: int = 3,
) -> DataFrame:
    """Top-k linkage candidates per left record: block-join, score
    name-suffix edit distance (codegen levenshtein on the last 6 chars)
    and balance-bucket agreement, keep score >= min_score. Returns
    (left_id, right_id, score, rank)."""
    ln, rn = name_cols
    lb, rb = bal_cols
    pairs = left.join(right, on=block_col)
    name_lev = F.levenshtein(
        F.expr(f"right({ln}, 6)"), F.expr(f"right({rn}, 6)")
    )
    w_name = (
        F.when(name_lev == 0, 4)
        .when(name_lev == 1, 2)
        .when(name_lev == 2, 1)
        .otherwise(-1)
    )
    w_bal = F.when(
        F.floor(F.col(lb) / 1000.0) == F.floor(F.col(rb) / 1000.0), 2
    ).otherwise(-1)
    scored = pairs.select(
        F.col(left_id),
        F.col(right_id),
        (w_name + w_bal).cast("int").alias("score"),
    ).where(F.col("score") >= min_score)
    w = Window.partitionBy(left_id).orderBy(
        F.col("score").desc(), F.col(right_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
