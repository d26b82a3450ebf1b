"""Data-quality expectations over DataFrames (dbt-tests / Great
Expectations shape): declarative rules -> one violations report.

The reference validates REQUESTS (request_validator.cpp); a warehouse
engine also needs to validate DATA. Rules:

- not_null(column)
- unique(columns...)
- accepted_values(column, values)
- in_range(column, lo, hi)
- references(column, ref_table_df, ref_column)  (FK integrity)

Scale shape: all row-level rules (not_null / accepted_values /
in_range) fuse into ONE conditional-sum aggregate over a single scan;
`unique` adds one groupBy on its key; `references` adds one
left-anti join per referenced table (broadcast when the ref side is a
dim). Nothing collects; the report is a tiny DataFrame of
(rule, column, violations, passed).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    ref: object = None  # DataFrame for `references`
    ref_column: str = ""


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def accepted_values(column: str, values) -> Rule:
    return Rule("accepted_values", column, values=tuple(values))


def in_range(column: str, lo, hi) -> Rule:
    return Rule("in_range", column, lo=lo, hi=hi)


def references(column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule("references", column, ref=ref, ref_column=ref_column)


_INTERVAL_RE = re.compile(
    r"^'?\d+'?\s+(?:year|month|week|day|hour|minute|second)s?$",
    re.IGNORECASE,
)
_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"
)


def freshness(column: str, max_age: str, as_of: str) -> Rule:
    """dbt source-freshness shape: the newest value of a timestamp
    column must be within `max_age` (an INTERVAL string like
    '2 days') of `as_of` (a timestamp literal; REQUIRED — no now()
    default — so the check is reproducible: the caller pins the
    evaluation instant). violations = 1 when stale, 0 when fresh;
    metadata-cheap (one max() aggregate).

    Both strings end up inside a SQL expression, so they are
    shape-validated here (fail fast at rule build, not with an
    AnalysisException mid-report — and no expression injection via a
    crafted interval)."""
    if as_of is None:
        raise ValueError(
            "freshness(as_of=...) is required: pass the evaluation "
            "instant explicitly (e.g. '2024-06-01 00:00:00')"
        )
    if not _TS_RE.match(str(as_of).strip()):
        raise ValueError(f"as_of is not a timestamp literal: {as_of!r}")
    if not _INTERVAL_RE.match(str(max_age).strip()):
        raise ValueError(
            f"max_age is not an INTERVAL string like '2 days': {max_age!r}"
        )
    return Rule("freshness", column, values=(max_age, as_of))


def _rule_label(r: Rule) -> str:
    return r.kind


def run_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, column, violations, passed).

    Row-level rules share one aggregate pass; set-level rules
    (unique, references) each contribute their own (still linear)
    aggregate, unioned into the report."""
    spark = df.sparkSession
    row_level = [r for r in rules if r.kind in
                 ("not_null", "accepted_values", "in_range")]
    parts: list[DataFrame] = []

    if row_level:
        aggs = []
        for i, r in enumerate(row_level):
            c = F.col(r.column)
            if r.kind == "not_null":
                bad = c.isNull()
            elif r.kind == "accepted_values":
                bad = ~c.isin(*r.values) | c.isNull()
            else:  # in_range
                bad = c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
            aggs.append(
                F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"v{i}")
            )
        one = df.agg(*aggs)
        parts.append(
            one.selectExpr(
                "stack({n}, {args}) as (rule, column, violations)".format(
                    n=len(row_level),
                    args=", ".join(
                        f"'{_rule_label(r)}', '{r.column}', v{i}"
                        for i, r in enumerate(row_level)
                    ),
                )
            )
        )

    for r in rules:
        if r.kind == "freshness":
            max_age, as_of = r.values
            stale = (
                df.agg(F.max(F.col(r.column)).alias("__mx"))
                .select(
                    F.when(
                        F.col("__mx").isNull()
                        | (
                            F.col("__mx")
                            < F.expr(f"TIMESTAMP '{as_of}' - INTERVAL {max_age}")
                        ),
                        1,
                    )
                    .otherwise(0)
                    .cast("long")
                    .alias("violations")
                )
            )
            parts.append(
                stale.select(
                    F.lit("freshness").alias("rule"),
                    F.lit(r.column).alias("column"),
                    "violations",
                )
            )
        elif r.kind == "unique":
            dups = (
                df.groupBy(r.column)
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
            )
            parts.append(
                dups.select(
                    F.lit("unique").alias("rule"),
                    F.lit(r.column).alias("column"),
                    "violations",
                )
            )
        elif r.kind == "references":
            # UNHINTED anti-join: the referenced table scales with SF
            # (a pinned broadcast of a billion-key dim aborts at the
            # 100 TB point); AQE broadcasts the distinct key set only
            # while measured-small, else shuffles on the key
            orphans = (
                df.select(F.col(r.column).alias("__fk"))
                .where(F.col("__fk").isNotNull())
                .join(
                    r.ref.select(
                        F.col(r.ref_column).alias("__fk")
                    ).distinct(),
                    "__fk",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            )
            parts.append(
                orphans.select(
                    F.lit("references").alias("rule"),
                    F.lit(r.column).alias("column"),
                    "violations",
                )
            )

    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "rule", "column",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry's data-quality demo: core integrity expectations
    over `orders` (key not-null + unique, status domain, price range,
    customer FK) — one fused row-level pass + a key groupBy + a
    broadcast anti-join."""
    from flapi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return run_expectations(
        orders,
        [
            not_null("o_orderkey"),
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            in_range("o_totalprice", 0.0, 1_000_000.0),
            unique("o_orderkey"),
            references("o_custkey", customer, "c_custkey"),
        ],
    )
