"""Learned language id (operators/langid.py, new r11 — VERDICT r10 #9):
hashed char-n-gram multinomial model with integer-quantized weights.
The registry row text_language_id_learned carries the exact-arithmetic
DuckDB oracle; these tests pin what the oracle can't — the planted
multilingual fixture actually SEPARATES, the fitted/pinned paths agree,
persistence round-trips, and the scoring plan is a zero-shuffle
projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.langid import (
    fit_language_id,
    language_id_scores,
    load_language_id,
    save_language_id,
)

TRAIN = {
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund",
        "ich moechte eine tasse kaffee und ein stueck kuchen bestellen",
        "die wissenschaftler haben eine neue entdeckung gemacht",
        "das wetter ist heute schoen und die sonne scheint",
        "morgen besuchen wir unsere freunde in der stadt",
        "er liest jeden abend ein interessantes buch",
    ],
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "i would like to order a cup of coffee and a piece of cake",
        "the scientists have made a new discovery this year",
        "the weather is beautiful today and the sun is shining",
        "tomorrow we are visiting our friends in the city",
        "he reads an interesting book every evening",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso",
        "me gustaria pedir una taza de cafe y un trozo de pastel",
        "los cientificos han hecho un nuevo descubrimiento este ano",
        "el tiempo es hermoso hoy y el sol esta brillando",
        "manana visitaremos a nuestros amigos en la ciudad",
        "el lee un libro interesante cada noche",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux",
        "je voudrais commander une tasse de cafe et un morceau de gateau",
        "les scientifiques ont fait une nouvelle decouverte cette annee",
        "le temps est magnifique aujourd hui et le soleil brille",
        "demain nous rendons visite a nos amis en ville",
        "il lit un livre interessant chaque soir",
    ],
}

HELDOUT = {
    "de": "die kinder spielen im garten hinter dem haus und lachen laut",
    "en": "the children are playing in the garden behind the house",
    "es": "los ninos estan jugando en el jardin detras de la casa",
    "fr": "les enfants jouent dans le jardin derriere la maison",
}


def _train_df(spark):
    rows = [(lang, s) for lang, sents in sorted(TRAIN.items()) for s in sents]
    return spark.createDataFrame(rows, "lang string, text string")


def test_fitted_model_separates_heldout_sentences(spark):
    w = fit_language_id(_train_df(spark), "text", "lang", buckets=64)
    assert sorted(w) == ["de", "en", "es", "fr"]
    assert all(len(v) == 64 for v in w.values())
    df = spark.createDataFrame(
        [(lang, s) for lang, s in sorted(HELDOUT.items())], "truth string, text string"
    )
    out = {r.truth: r.pred_lang for r in
           language_id_scores(df, "truth", "text", w).collect()}
    assert out == {lang: lang for lang in HELDOUT}, out


def test_fit_is_deterministic_and_bounded(spark):
    df = _train_df(spark)
    assert fit_language_id(df, "text", "lang") == fit_language_id(df, "text", "lang")


def test_pinned_weights_agree_with_regenerated_fit(spark):
    """The committed lid_pinned.py fixture must be exactly what
    scripts/gen_lid_pinned.py's seed corpus fits to — a stale fixture
    would silently diverge from the generator."""
    from pgdedupe_spark.operators.lid_pinned import BUCKETS, NGRAM, WEIGHTS
    from scripts.gen_lid_pinned import SCALE, SEED_SENTENCES

    rows = [(lang, s) for lang, sents in sorted(SEED_SENTENCES.items()) for s in sents]
    df = spark.createDataFrame(rows, "lang string, text string")
    refit = fit_language_id(
        df, "text", "lang", n=NGRAM, buckets=BUCKETS, scale=SCALE, portable=True
    )
    assert refit == WEIGHTS


def test_pinned_model_separates_the_seed_languages(spark):
    from pgdedupe_spark.operators.lid_pinned import BUCKETS, NGRAM, WEIGHTS

    df = spark.createDataFrame(
        [(lang, s) for lang, s in sorted(HELDOUT.items())], "truth string, text string"
    )
    out = {r.truth: r.pred_lang for r in language_id_scores(
        df, "truth", "text", WEIGHTS, n=NGRAM, buckets=BUCKETS).collect()}
    assert out == {lang: lang for lang in HELDOUT}, out


def test_persistence_round_trip(spark, tmp_path):
    w = fit_language_id(_train_df(spark), "text", "lang")
    p = str(tmp_path / "lid.json")
    save_language_id(w, p)
    assert load_language_id(p) == w


def test_scoring_plan_zero_shuffle_no_python(spark):
    from pgdedupe_spark.operators.lid_pinned import BUCKETS, NGRAM, WEIGHTS

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = language_id_scores(df, "doc_id", "text", WEIGHTS, n=NGRAM, buckets=BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan
    assert "Join" not in plan


def test_null_empty_and_short_text(spark):
    from pgdedupe_spark.operators.lid_pinned import BUCKETS, NGRAM, WEIGHTS

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in language_id_scores(
        df, "doc_id", "text", WEIGHTS, n=NGRAM, buckets=BUCKETS).collect()}
    for i in (1, 2, 3):
        # no grams → all scores 0 → tie-break to the ascending-first lang
        assert rows[i].pred_lang == "de"
        assert rows[i].score_de == 0 and rows[i].score_zh == 0


def test_engine_hash_production_variant_runs(spark):
    """portable=False (xxhash64 buckets) is the 100 TB production hash —
    same plan shape, no md5; smoke the full path end-to-end."""
    df = _train_df(spark)
    w = fit_language_id(df, "text", "lang", portable=False)
    out = language_id_scores(df, "lang", "text", w, portable=False).collect()
    assert len(out) == sum(len(v) for v in TRAIN.values())


def test_non_identifier_labels_raise_clearly(spark):
    """ADVICE r11: labels are interpolated into generated SQL column
    names (score_<lang>); 'zh-CN' / 'pt BR' used to produce invalid SQL
    that failed opaquely at plan time. Both fit and score must raise a
    clear ValueError naming the offending label instead."""
    import pytest

    df = spark.createDataFrame(
        [("hello there", "zh-CN"), ("bonjour", "pt BR")], "text string, lang string"
    )
    with pytest.raises(ValueError, match="zh-CN|pt BR"):
        fit_language_id(df, "text", "lang")

    ok = {"en": [0] * 64}
    with pytest.raises(ValueError, match="zh-CN"):
        language_id_scores(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "doc_id", "text", {**ok, "zh-CN": [0] * 64},
        )
    # normalized labels fit and score end-to-end
    norm = df.withColumn("lang", F.translate("lang", "- ", "__"))
    w = fit_language_id(norm, "text", "lang")
    assert set(w) == {"zh_CN", "pt_BR"}
    out = language_id_scores(norm, "lang", "text", w).columns
    assert "score_zh_CN" in out and "score_pt_BR" in out
