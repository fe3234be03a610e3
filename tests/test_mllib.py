"""MLlib-adapter classifier (SURVEY.md §2.7 D4 — pluggable classifier slot).

The adapter fits pyspark.ml LogisticRegression on the tiny labeled set and
exposes (weights, bias) so scoring stays the JVM sigmoid expression; both
registry entries must agree on a cleanly separable problem.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pgdedupe_spark.operators.scoring import (
    CLASSIFIERS,
    LogisticRegressionClassifier,
    MLlibLogisticRegressionClassifier,
    score_pairs,
)


def _separable():
    rng = np.random.RandomState(0)
    x_pos = rng.randn(40, 3) * 0.3 + np.array([1.0, 1.0, 0.5])
    x_neg = rng.randn(40, 3) * 0.3 + np.array([-1.0, -0.5, -1.0])
    X = np.vstack([x_pos, x_neg])
    y = np.array([1.0] * 40 + [0.0] * 40)
    return X, y


def test_registry_has_both():
    assert CLASSIFIERS["logistic_regression"] is LogisticRegressionClassifier
    assert CLASSIFIERS["mllib_logistic_regression"] is MLlibLogisticRegressionClassifier


def test_mllib_adapter_matches_numpy_fit(spark):
    X, y = _separable()
    np_clf = LogisticRegressionClassifier().fit(X, y)
    ml_clf = MLlibLogisticRegressionClassifier().fit(X, y)
    assert ml_clf.weights.shape == np_clf.weights.shape
    # same convex optimum modulo tolerance: predictions agree on every point
    agree = (np_clf.predict_proba(X) > 0.5) == (ml_clf.predict_proba(X) > 0.5)
    assert agree.all()
    # and both are confident on this separable set
    assert (ml_clf.predict_proba(X[:40]) > 0.8).all()
    assert (ml_clf.predict_proba(X[40:]) < 0.2).all()


def test_mllib_weights_drive_jvm_scoring(spark):
    """The hot path stays score_expr (JVM sigmoid) — scoring a pair frame
    with MLlib-fit weights must match driver-side predict_proba."""
    X, y = _separable()
    clf = MLlibLogisticRegressionClassifier().fit(X, y)
    rows = [(int(i), int(i + 1000), [float(v) for v in X[i]]) for i in range(len(X))]
    pairs = spark.createDataFrame(rows, "id1 long, id2 long, features array<double>")
    scored = {r.id1: r.score for r in score_pairs(pairs, clf, threshold=0.0).collect()}
    want = clf.predict_proba(X)
    for i in range(len(X)):
        assert abs(scored[i] - want[i]) < 1e-9

    # plan check: scoring is a plain projection+filter over the pair scan —
    # no MLlib transformer, no Python UDF in the plan
    plan = score_pairs(pairs, clf, threshold=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
