"""Model-evaluation aggregates: exact AUC-ROC and confusion-matrix
metrics, distributed.

A training-data pipeline that learns filters (the quality classifier,
dedup verifiers, contamination flags) needs to EVALUATE them at the
same scale it applies them — sklearn on a driver-side sample silently
mis-ranks classifiers whose errors concentrate in the tail the sample
missed. Both operators here are pure aggregate plans over the full
fact table (no reference counterpart — the reference engine has no ML
surface at all; this extends the training-data superset alongside
operators/text.py's quality classifier).

Exactness: every statistic is integer arithmetic until (at most) one
final IEEE division of exact integer operands — bit-identical in any
engine, the repo-wide float contract (plans/parity.py).

Scale shape:

- ``auc_exact`` is the rank-sum (Mann-Whitney U) formulation with
  average ranks for ties, computed WITHOUT a row-grain global sort:
  one map-side-combinable ``groupBy(keys, score)`` collapses the fact
  table to score grain, then a window ordered by score runs over the
  DISTINCT-score table only — |distinct scores| rows per key group,
  orders of magnitude smaller than the facts. With empty ``keys`` the
  window is single-partition, bounded by distinct scores (document the
  cardinality or bucket the scores first).
- ``confusion_counts`` is ONE hash aggregate (four conditional sums),
  map-side combinable, output grain = |key groups|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def auc_exact(
    df: DataFrame,
    label: Column,
    score: Column,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Exact AUC-ROC per ``keys`` group: ``label`` is a boolean column
    (positive class), ``score`` an exactly-comparable column (integer
    quanta for float scores — ``plans.parity.quanta``). Ties get
    average ranks (the Mann-Whitney convention), kept integer by
    working in DOUBLED ranks: the average rank of a tie run occupying
    rows ``cb+1 .. cb+t`` is ``cb + (t+1)/2``, so its double is
    ``2·cb + t + 1`` — an integer.

    Returns one row per key group: ``n_pos``, ``n_neg``,
    ``auc_num = Σ_pos 2r − n_pos·(n_pos+1)``,
    ``auc_den = 2·n_pos·n_neg``, and ``auc`` (the one IEEE division;
    NULL when a group lacks both classes).
    """
    keyed = list(keys)
    per_score = (
        df.select(*keyed, label.alias("__pos"), score.alias("__s"))
        .groupBy(*keyed, "__s")
        .agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("np"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("nn"),
        )
    )
    w = Window.partitionBy(*keyed).orderBy("__s")
    cum_before = F.coalesce(
        F.sum(F.col("np") + F.col("nn")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    # doubled average rank of this score's tie run, weighted by its
    # positive count: Σ_pos 2r in one pass
    contrib = F.col("np") * (
        2 * cum_before + F.col("np") + F.col("nn") + 1
    )
    totals = per_score.select(
        *keyed,
        contrib.alias("__c"),
        F.col("np").alias("__np"),
        F.col("nn").alias("__nn"),
    ).groupBy(*keyed).agg(
        F.sum("__np").cast("long").alias("n_pos"),
        F.sum("__nn").cast("long").alias("n_neg"),
        F.sum("__c").cast("long").alias("__rank2_sum"),
    )
    num = F.col("__rank2_sum") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return totals.select(
        *keyed,
        "n_pos",
        "n_neg",
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).alias("auc"),
    )


def auc_exact_sql(
    label_sql: str,
    score_sql: str,
    table: str,
    keys: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`auc_exact` — same doubled-rank algebra,
    same column names, for oracle registration."""
    keyed = list(keys)
    kcols = ", ".join(keyed)
    kpre = f"{kcols}, " if keyed else ""
    part = f"PARTITION BY {kcols} " if keyed else ""
    grp = f"GROUP BY {kcols}" if keyed else ""
    return f"""
    WITH per_score AS (
      SELECT {kpre}{score_sql} AS s,
             sum(CASE WHEN {label_sql} THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN {label_sql} THEN 0 ELSE 1 END) AS nn
      FROM {table} GROUP BY {kpre.rstrip(", ") + ", " if keyed else ""}s
    ),
    ranked AS (
      SELECT {kpre}np, nn,
             coalesce(sum(np + nn) OVER ({part}ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM per_score
    ),
    totals AS (
      SELECT {kpre}
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             CAST(sum(np * (2 * cb + np + nn + 1)) AS BIGINT) AS rank2_sum
      FROM ranked {grp}
    )
    SELECT {kpre}n_pos, n_neg,
           CAST(rank2_sum - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
           CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
           CASE WHEN n_pos * n_neg > 0 THEN
             CAST(rank2_sum - n_pos * (n_pos + 1) AS DOUBLE)
               / CAST(2 * n_pos * n_neg AS DOUBLE)
           END AS auc
    FROM totals
    """


def confusion_counts(
    df: DataFrame,
    label: Column,
    pred: Column,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Per-group confusion matrix + derived metrics in ONE hash
    aggregate: ``tp/fp/fn/tn`` exact counts, then ``precision``,
    ``recall``, and ``f1`` each as a single IEEE division of exact
    integers (NULL when the denominator is 0, never NaN)."""
    keyed = list(keys)
    lab, prd = label.alias("__y"), pred.alias("__p")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = (
        df.select(*keyed, lab, prd)
        .groupBy(*keyed)
        .agg(
            cnt(F.col("__y") & F.col("__p")).alias("tp"),
            cnt(~F.col("__y") & F.col("__p")).alias("fp"),
            cnt(F.col("__y") & ~F.col("__p")).alias("fn"),
            cnt(~F.col("__y") & ~F.col("__p")).alias("tn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    div = lambda n, d: F.when(d > 0, n.cast("double") / d.cast("double"))  # noqa: E731
    return agg.select(
        *keyed,
        "tp",
        "fp",
        "fn",
        "tn",
        div(tp, tp + fp).alias("precision"),
        div(tp, tp + fn).alias("recall"),
        div(2 * tp, 2 * tp + fp + fn).alias("f1"),
    )
