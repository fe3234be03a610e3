"""A user-supplied pair classifier for the dotted-path config test.

The reference accepts any ``classifier: module.ClassName`` string and
dynamically imports it (``pgdedupe/run.py:133-136``); this module plays the
role of the user's package. Only the duck-typed surface the pipeline
consumes is required: ``fit(X, y) -> self`` plus ``weights``/``bias`` —
scoring always runs as the JVM sigmoid expression over those.
"""

from __future__ import annotations

import numpy as np


class CentroidGapClassifier:
    """Deliberately NOT logistic regression: weights = difference of class
    feature centroids (a linear prototype classifier), so the test proves
    an arbitrary user class flows through fit → score → cluster."""

    def __init__(self, scale: float = 8.0):
        self.scale = scale
        self.weights: np.ndarray | None = None
        self.bias: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "CentroidGapClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        mu_pos = X[y == 1].mean(axis=0)
        mu_neg = X[y == 0].mean(axis=0)
        self.weights = self.scale * (mu_pos - mu_neg)
        mid = (mu_pos + mu_neg) / 2.0
        self.bias = -float(self.weights @ mid)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = np.asarray(X) @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-z))
