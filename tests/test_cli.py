"""CLI smoke + end-to-end over parquet (reference tests/test_pgdedupe.py
CLI smoke + test_integration.py run-to-completion, §5)."""

from __future__ import annotations

import json
import os

import pytest

from pgdedupe_spark.cli import build_parser, main
from pgdedupe_spark.ml.training import write_training
from tests.datagen import generate_population, training_pairs

CONFIG = {
    "schema": "dedupe",
    "table": "entries",
    "key": "entry_id",
    "fields": [
        {"field": "first_name", "type": "String"},
        {"field": "last_name", "type": "String"},
        {"field": "ssn", "type": "String", "has missing": True},
        {"field": "dob", "type": "String", "has missing": True},
    ],
    "filter_condition": "last_name is not null",
    "merge_exact": [["ssn"]],
}


def test_help_exits_zero():
    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--help"])
    assert e.value.code == 0


def test_missing_required_args_fail():
    # requiredness is enforced in main (after the --capabilities early
    # exit), still as an argparse SystemExit before any Spark work
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code != 0


def test_capabilities_flag(capsys):
    """--capabilities surfaces the media-decode probe as JSON and exits
    without needing config/input/output/training (VERDICT r1 item 8)."""
    assert main(["--capabilities"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {
        "decode": {"audio": False, "image": False, "video": False},
        "native": ["audio", "image", "video"],
    }


def test_cli_end_to_end(spark, tmp_path):
    rows, _, _ = generate_population(60, seed=3)
    src = spark.createDataFrame(
        rows,
        "entry_id long, first_name string, last_name string, ssn string, sex string, dob string",
    )
    inp = str(tmp_path / "entries.parquet")
    src.write.parquet(inp)

    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps(CONFIG))
    tr = tmp_path / "training.json"
    write_training(str(tr), training_pairs())

    out = str(tmp_path / "out")
    rc = main(
        ["--config", str(cfg), "--input", inp, "--output", out, "--training", str(tr)]
    )
    assert rc == 0
    um = spark.read.parquet(os.path.join(out, "unique_map.parquet"))
    n_src = src.filter("last_name is not null").count()
    assert um.filter("dedupe_id is not null").count() == n_src
    n_entities = um.select("dedupe_id").distinct().count()
    assert 0 < n_entities < n_src


def test_query_cli_list(capsys):
    """`python -m pgdedupe_spark.query --list` enumerates the registry with
    oracle marks — the user-facing index of SURVEY §2 coverage."""
    from pgdedupe_spark.query import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "a1_exact_collapse" in out and "dedup_minhash_lsh" in out
    assert out.count("✓") >= 45  # oracle-checked majority
    assert main(["definitely_not_a_query"]) == 2


def test_sql_frontend_matches_dataframe_query(spark, sf_dir):
    """S5 ad-hoc SQL bridge: the same statement over the registered views
    must equal the DataFrame-API registry query — one Catalyst planner
    under both front-ends."""
    from pgdedupe_spark import registry
    from pgdedupe_spark.query import run_sql

    got = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    )
    want = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_frontend_events_view_has_ts_us(spark, sf_dir):
    """The events view exposes the registry's exact-µs time convention."""
    from pgdedupe_spark.query import run_sql

    row = run_sql(
        spark, sf_dir, "SELECT count(*) AS n, min(ts_us) AS lo FROM events"
    ).collect()[0]
    assert row.n > 0 and isinstance(row.lo, int)


def test_maintenance_cli_stats_and_compact(spark, sf_dir, tmp_path, capsys):
    """The maintenance surface is a thin shell over the pinned operators;
    drive both subcommands in-process and check the printed facts."""
    from pgdedupe_spark.maintenance import main

    assert main(["stats", f"{sf_dir}/nation.parquet", "n_name"]) == 0
    out = capsys.readouterr().out
    assert "ndv=25" in out and "rows=25" in out

    dst = str(tmp_path / "compacted")
    assert main(["compact", f"{sf_dir}/orders.parquet", dst, "--target-mb", "1",
                 "--sort-by", "o_orderkey"]) == 0
    out = capsys.readouterr().out
    assert "1500 rows" in out or "rows" in out
    assert spark.read.parquet(dst).count() == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_maintenance_cli_validate(spark, sf_dir, tmp_path, capsys):
    """`validate` runs declarative rules against a parquet table and the
    exit code reflects whether every expectation held."""
    import json

    from pgdedupe_spark.maintenance import main

    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"rule": "not_null", "col": "doc_id"},
        {"rule": "unique", "col": "doc_id"},
        {"rule": "in_range", "col": "n_chars", "min": 0},
    ]))
    assert main(["validate", f"{sf_dir}/documents.parquet", str(rules)]) == 0
    assert "ok" in capsys.readouterr().out

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([
        {"rule": "in_set", "col": "lang", "values": ["en"]},
        {"rule": "foreign_key", "col": "doc_id",
         "ref_path": f"{sf_dir}/embeddings.parquet", "ref_col": "vec_id"},
    ]))
    rc = main(["validate", f"{sf_dir}/documents.parquet", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL" in out
