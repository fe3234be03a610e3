"""Data-validation rules (operators/quality.py): every rule kind, the
one-pass plan property, and the report contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.quality import validate_table


def _frame(spark):
    rows = [
        (1, "en", 10, "web"),
        (2, "en", -3, "web"),        # in_range violation (n < 0)
        (2, "de", 5, "books"),       # duplicate id
        (None, "xx", 7, "web"),      # null id + lang outside set
        (4, "de", 9, "Web!"),        # matches violation (uppercase+punct)
    ]
    return spark.createDataFrame(rows, "id int, lang string, n int, source string")


def test_all_row_local_rules(spark):
    df = _frame(spark)
    rules = [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "n", "min": 0, "max": 100},
        {"rule": "in_set", "col": "lang", "values": ["en", "de"]},
        {"rule": "matches", "col": "source", "pattern": "^[a-z_]+$"},
    ]
    got = {(r.rule, r.column): (r.violations, r.passed) for r in validate_table(df, rules).collect()}
    assert got == {
        ("not_null", "id"): (1, False),
        ("unique", "id"): (1, False),        # id=2 twice → one extra row
        ("in_range", "n"): (1, False),
        ("in_set", "lang"): (1, False),
        ("matches", "source"): (1, False),
    }


def test_multi_col_unique_and_pass(spark):
    df = _frame(spark)
    out = {r.rule: r for r in validate_table(df, [
        {"rule": "unique", "cols": ["id", "lang"]},
        {"rule": "in_range", "col": "n", "max": 100},
    ]).collect()}
    assert out["unique"].violations == 0 and out["unique"].passed
    assert out["in_range"].passed


def test_foreign_key_rule(spark):
    df = _frame(spark)
    dims = spark.createDataFrame([("web",), ("books",)], "src string")
    out = validate_table(
        df, [{"rule": "foreign_key", "col": "source", "ref": dims, "ref_col": "src"}]
    ).collect()
    assert out[0].violations == 1  # "Web!" unresolved; NULLs would be skipped
    assert not out[0].passed


def test_row_local_rules_share_one_aggregation(spark):
    """All row-local rules must compile into ONE aggregation pass — the
    plan may contain at most the two exchanges of a single global agg
    (partial + final), regardless of rule count."""
    import re

    df = _frame(spark)
    out = validate_table(df, [
        {"rule": "not_null", "col": "id"},
        {"rule": "in_range", "col": "n", "min": 0},
        {"rule": "in_set", "col": "lang", "values": ["en", "de"]},
        {"rule": "matches", "col": "source", "pattern": "^[a-z_]+$"},
        {"rule": "unique", "col": "id"},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one logical aggregation: a single scan of the input frame
    assert len(re.findall(r"Scan ExistingRDD", plan)) == 1, plan


def test_empty_rules_and_empty_frame(spark):
    df = _frame(spark)
    assert validate_table(df, []).count() == 0
    empty = spark.createDataFrame([], "id int, lang string, n int, source string")
    out = {r.rule: r for r in validate_table(empty, [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
    ]).collect()}
    assert out["not_null"].violations == 0 and out["not_null"].passed
    assert out["unique"].violations == 0 and out["unique"].passed


def test_in_range_without_bounds_rejected(spark):
    """A boundless in_range rule always passed silently (ADVICE r5) —
    it is a config typo and must raise."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="in_range"):
        validate_table(_frame(spark), [{"rule": "in_range", "col": "n"}])


def test_rule_labels_are_injection_safe(spark):
    """Rule/column labels travel as lit() values, not interpolated SQL —
    a quoted/backticked column name must neither break nor inject."""
    df = _frame(spark).withColumnRenamed("n", "weird `col` 'name'")
    out = validate_table(
        df, [{"rule": "in_range", "col": "weird `col` 'name'", "min": 0}]
    ).collect()
    assert len(out) == 1
    assert out[0].column == "weird `col` 'name'"
    assert out[0].violations == 1  # the fixture's n=-3 row, correctly counted


# ---------------------------------------------------------------------------
# Gopher rule-based quality gate (new r10)
# ---------------------------------------------------------------------------


def test_gopher_rules_planted_cases(spark):
    """Each rule trips on a crafted doc; a plain 60-word English paragraph
    passes all seven."""
    from pgdedupe_spark.operators.text import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over and that have with lazy dogs"] * 5
    )  # 60 words, mean len ~4, stopword-rich
    short = "the cat sat"  # rule 1: < 50 words
    symbols = " ".join(["word #tag"] * 30)  # rule 3: symbol ratio 0.5
    bullets = "\n".join(["- item one two three"] * 10) + "\nthe of and"  # rule 4 ok (10/11 < 0.9)... keep False anyway via word count
    nonalpha = " ".join(["12345 67890"] * 30)  # rule 6: no alpha words
    no_stop = " ".join(["zebra lion puma cobra"] * 15)  # rule 7: 0 required hits
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, nonalpha), (5, no_stop), (6, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert out[1].keep == 1, out[1]
    assert out[2].keep == 0 and out[2].n_words == 3
    assert out[3].keep == 0 and out[3].symbol_ratio > 0.1
    assert out[4].keep == 0 and out[4].frac_alpha_words == 0.0
    assert out[5].keep == 0 and out[5].n_required_hits == 0
    assert out[6].keep == 0 and out[6].n_words == 0  # NULL text guarded


def test_gopher_rules_line_signals(spark):
    from pgdedupe_spark.operators.text import gopher_quality

    body = " ".join(["the of and that have with be to common words here"] * 6)
    bullet_doc = "\n".join(["- point"] * 19 + [body])  # 19/20 bullet lines
    ell_doc = "\n".join(["trailing line..."] * 2 + [body] * 3)  # 2/5 > 0.3? no: 0.4 > 0.3
    df = spark.createDataFrame(
        [(1, bullet_doc), (2, ell_doc)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert out[1].frac_bullet_lines == 0.95 and out[1].keep == 0
    assert out[2].frac_ellipsis_lines == 0.4 and out[2].keep == 0


def _ccnet_corpus(spark):
    """Fluent docs reuse the common vocabulary; garbled docs are made of
    tokens that appear nowhere else (count 1 ⇒ minimal logprob). Mixed
    docs sit between. Two languages to exercise the per-lang terciles."""
    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    i = 0
    for lang in ("en", "de"):
        for _ in range(3):
            rows.append((i, lang, common)); i += 1
        for _ in range(3):
            rows.append((i, lang, common + f" zz{i}q zz{i}w zz{i}e")); i += 1
        for _ in range(3):
            rows.append((i, lang, f"qq{i}a qq{i}b qq{i}c qq{i}d qq{i}e")); i += 1
    rows.append((98, "en", ""))      # zero tokens
    rows.append((99, "en", None))    # NULL text
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


def test_ccnet_buckets_orders_fluency_per_language(spark):
    from pgdedupe_spark.operators.text import ccnet_buckets

    df = _ccnet_corpus(spark)
    out = {r.doc_id: r for r in
           ccnet_buckets(df, "doc_id", "text", lang_col="lang").collect()}
    assert len(out) == 20
    for lang_base in (0, 9):
        # 3 fluent / 3 mixed / 3 garbled per language → clean terciles
        for j in range(3):
            assert out[lang_base + j].tier == "head", out[lang_base + j]
        for j in range(3, 6):
            assert out[lang_base + j].tier == "middle", out[lang_base + j]
        for j in range(6, 9):
            assert out[lang_base + j].tier == "tail", out[lang_base + j]
    assert out[98].tier == "empty" and out[98].bucket == 0
    assert out[99].tier == "empty" and out[99].n_tokens == 0
    # scores are monotone with the buckets inside a language
    en = [r for r in out.values() if r.lang == "en" and r.bucket > 0]
    for a in en:
        for b in en:
            if a.bucket < b.bucket:
                assert a.mean_lp >= b.mean_lp, (a, b)


def test_ccnet_buckets_approx_mode_contract(spark):
    """approx=False drops the Window; buckets stay monotone in score and
    the run is deterministic."""
    from pgdedupe_spark.operators.text import ccnet_buckets

    df = _ccnet_corpus(spark)
    out = ccnet_buckets(df, "doc_id", "text", lang_col="lang", exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    rows = out.collect()
    assert len(rows) == 20
    by_lang = {}
    for r in rows:
        if r.bucket > 0:
            by_lang.setdefault(r.lang, []).append(r)
    for members in by_lang.values():
        # with heavily tied scores a cutoff can merge adjacent buckets
        # (documented: cutoff ties keep the better bucket) — but buckets
        # stay within range, the head is never empty, and scores are
        # monotone across buckets
        assert {r.bucket for r in members} <= {1, 2, 3}
        assert any(r.bucket == 1 for r in members)
        for a in members:
            for b in members:
                if a.bucket < b.bucket:
                    assert a.mean_lp >= b.mean_lp
    again = ccnet_buckets(df, "doc_id", "text", lang_col="lang", exact=False).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_ccnet_buckets_exact_plan_single_window(spark):
    from pgdedupe_spark.operators.text import ccnet_buckets

    df = _ccnet_corpus(spark)
    plan = (
        ccnet_buckets(df, "doc_id", "text", lang_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1, plan
    assert "PythonUDF" not in plan


def test_ccnet_served_lm_identical_and_scan_bounded(spark):
    """Production one-scan paths (VERDICT r10 #2): a served (lm=) or
    eagerly-materialized LM must score bit-identically to the 8-scan
    declarative form, with the scoring plan reading the corpus exactly
    twice (token stream + the id/lang base restoring zero-token docs)."""
    import re

    from pgdedupe_spark.operators.text import ccnet_buckets, ccnet_lm
    from pgdedupe_spark.plans import explain_str

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    decl = ccnet_buckets(df, "doc_id", "text", lang_col="lang")
    lm = ccnet_lm(df, "text").localCheckpoint(eager=True)  # the written sidecar
    served = ccnet_buckets(df, "doc_id", "text", lang_col="lang", lm=lm)
    mat = ccnet_buckets(df, "doc_id", "text", lang_col="lang", materialize=True)

    want = sorted(map(tuple, decl.collect()))
    assert sorted(map(tuple, served.collect())) == want
    assert sorted(map(tuple, mat.collect())) == want

    def scans(d):
        return len(set(re.findall(r"\((\d+)\) Scan parquet", explain_str(d))))

    assert scans(served) == 2, explain_str(served)
    assert scans(mat) == 2
    assert scans(decl) > 2  # the measured multi-scan shape the pin guards
