"""Declarative data-validation (expectation checks) for pipeline gates.

Training-data pipelines need a cheap contract check between stages: before
a 100 TB corpus feeds tokenization, assert the things downstream silently
depends on — keys unique, required columns populated, values in range,
categories closed, foreign keys resolvable. This is the Deequ/Great-
Expectations idea re-expressed as plain Spark aggregations so it runs as
ONE pass for all row-local rules plus one anti-join per referential rule.

Design:
* every row-local rule compiles to a conditional count in a single
  ``agg`` (map-side combined, one shuffle for the whole rule set);
* referential rules are LEFT ANTI joins counting unresolved keys (the
  dim side is typically broadcastable; AQE decides);
* the report is a tiny DataFrame — (rule, column, violations, passed) —
  not an exception, so callers choose their failure policy (the CLI
  exits non-zero when any rule fails).

Rules (dicts, JSON-friendly so configs can carry them):
  {"rule": "not_null",  "col": "doc_id"}
  {"rule": "unique",    "col": "doc_id"}                  # or cols: [...]
  {"rule": "in_range",  "col": "n_chars", "min": 0, "max": 1e9}
  {"rule": "in_set",    "col": "lang", "values": ["en", "de"]}
  {"rule": "matches",   "col": "source", "pattern": "^[a-z_]+$"}
  {"rule": "foreign_key", "col": "user_id", "ref": <DataFrame>, "ref_col": "id"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = "rule string, column string, violations bigint, passed boolean"

def _c(name: str):
    """Column reference by LITERAL name: F.col() parses backticks as
    quoting, so user column names containing backticks (or names that look
    like nested paths) must be escaped before resolution."""
    return F.col("`" + str(name).replace("`", "``") + "`")


def validate_table(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run every rule; return (rule, column, violations, passed) — one row
    per rule. All row-local rules share one aggregation pass; ``unique``
    adds one count-distinct to the same pass; each ``foreign_key`` rule
    costs one anti-join count."""
    spark = df.sparkSession
    aggs = []
    labels: list[tuple[str, str]] = []

    def _viol(cond):  # count of rows violating `cond`'s negation
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))

    for r in rules:
        kind = r["rule"]
        if kind == "not_null":
            aggs.append(_viol(_c(r["col"]).isNull()))
            labels.append((kind, r["col"]))
        elif kind == "unique":
            cols = r.get("cols", [r.get("col")])
            # duplicates = n_rows_with_fully_nonnull_key - ndv (count
            # distinct skips tuples with any NULL); NULL keys are not
            # uniqueness violations (pair with not_null to forbid)
            key_nonnull = None
            for c in cols:
                e = _c(c).isNotNull()
                key_nonnull = e if key_nonnull is None else (key_nonnull & e)
            aggs.append(
                F.sum(F.when(key_nonnull, 1).otherwise(0))
                - F.count_distinct(*[_c(c) for c in cols])
            )
            labels.append((kind, ",".join(cols)))
        elif kind == "in_range":
            if "min" not in r and "max" not in r:
                # a boundless range would silently always pass — that is a
                # config typo, not a satisfied expectation
                raise ValueError(f"in_range rule on {r['col']!r} needs min and/or max")
            c = _c(r["col"])
            cond = F.lit(False)
            if "min" in r:
                cond = cond | (c < F.lit(r["min"]))
            if "max" in r:
                cond = cond | (c > F.lit(r["max"]))
            aggs.append(_viol(cond))
            labels.append((kind, r["col"]))
        elif kind == "in_set":
            c = _c(r["col"])
            aggs.append(_viol(c.isNotNull() & ~c.isin(*r["values"])))
            labels.append((kind, r["col"]))
        elif kind == "matches":
            c = _c(r["col"])
            aggs.append(_viol(c.isNotNull() & ~c.rlike(r["pattern"])))
            labels.append((kind, r["col"]))
        elif kind == "foreign_key":
            continue  # joins handled below, outside the shared agg pass
        else:
            raise ValueError(f"unknown rule: {kind!r}")

    reports: list[DataFrame] = []
    if aggs:
        wide = df.agg(*[a.cast("long").alias(f"_v{i}") for i, a in enumerate(aggs)])
        # unpivot via explode-of-structs with lit() labels — no SQL-string
        # interpolation, so rule/column names containing quotes or
        # backticks can neither break the statement nor inject into it
        rows = F.array(
            *[
                F.struct(
                    F.lit(k).alias("rule"),
                    F.lit(c).alias("column"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0).cast("long")).alias(
                        "violations"
                    ),
                )
                for i, (k, c) in enumerate(labels)
            ]
        )
        reports.append(
            wide.select(F.explode(rows).alias("_r")).select(
                "_r.rule", "_r.column", "_r.violations"
            )
        )

    for r in rules:
        if r["rule"] != "foreign_key":
            continue
        unresolved = (
            df.select(_c(r["col"]).alias(r["col"]))
            .filter(_c(r["col"]).isNotNull())
            .join(
                r["ref"].select(_c(r["ref_col"]).alias(r["col"])).distinct(),
                r["col"],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(
                F.lit("foreign_key").alias("rule"),
                F.lit(r["col"]).alias("column"),
                "violations",
            )
        )
        reports.append(unresolved)

    if not reports:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("violations") == 0)
