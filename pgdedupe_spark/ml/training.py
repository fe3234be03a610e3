"""Training-pair persistence + model hash (SURVEY.md §2.7 D11, D12).

* Training JSON format is the reference's exactly
  (``tests/dedup_postgres_training.json``, read at ``pgdedupe/run.py:156-159``):
  ``{"distinct": [...], "match": [...]}`` where each element is
  ``{"__class__": "tuple", "__value__": [record, record]}``.
* Model-definition hash reproduces ``pgdedupe/utils.py:20-44``: MD5 of the
  canonical JSON of the model-determining inputs.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from pgdedupe_spark.config import DedupeConfig
from pgdedupe_spark.operators.features import FieldDef
from pgdedupe_spark.operators.scoring import get_classifier


def read_training(path: str) -> dict[str, list[tuple[dict, dict]]]:
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for label in ("distinct", "match"):
        pairs = []
        for item in raw.get(label, []):
            val = item["__value__"] if isinstance(item, dict) and "__value__" in item else item
            pairs.append((val[0], val[1]))
        out[label] = pairs
    return out


def write_training(path: str, pairs: dict[str, list[tuple[dict, dict]]]) -> None:
    enc = {
        label: [{"__class__": "tuple", "__value__": [a, b]} for a, b in pairs.get(label, [])]
        for label in ("distinct", "match")
    }
    with open(path, "w") as f:
        json.dump(enc, f, sort_keys=True)


def _py_features(rec1: dict, rec2: dict, fields: list[FieldDef],
                 interactions: list[tuple[str, str]]) -> list[float]:
    """Driver-side mirror of operators/features.py feature_columns — same
    layout, numpy/python implementation, used only to fit the classifier on
    the (tiny) labeled set."""

    def lev(a: str, b: str) -> int:
        if a == b:
            return 0
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    feats: list[float] = []
    primary: dict[str, float] = {}
    for fd in fields:
        a, b = rec1.get(fd.field), rec2.get(fd.field)
        missing = a is None or b is None
        if fd.type == "Categorical" and fd.categories:
            same = 0.5 if missing else float(a == b)
            primary[fd.field] = same
            feats.append(same)
            for cat in fd.categories:
                feats.append(float((not missing) and a == cat and b == cat))
        elif fd.type == "Exact":
            sim = 0.5 if missing else float(a == b)
            primary[fd.field] = sim
            feats.append(sim)
        elif fd.metric == "affine_gap":
            # same Gotoh DP the scoring plan's Arrow UDF runs — training
            # and scoring must see the same feature space (D1 fidelity)
            from pgdedupe_spark.operators.features import affine_gap_sim_scalar

            sim = affine_gap_sim_scalar(a, b)
            primary[fd.field] = sim
            feats.append(sim)
        else:
            if missing:
                sim = 0.5
            else:
                m = max(len(a), len(b))
                sim = 1.0 if m == 0 else 1.0 - lev(a, b) / m
            primary[fd.field] = sim
            feats.append(sim)
        if fd.has_missing:
            feats.append(float(missing))
    for x, y in interactions:
        feats.append(primary[x] * primary[y])
    return feats


def fit_classifier(config: DedupeConfig, training: dict[str, list[tuple[dict, dict]]]):
    """Fit the configured classifier on the labeled pairs (driver-side —
    the labeled set is ~10²; see operators/scoring.py for why)."""
    X, y = [], []
    for a, b in training.get("match", []):
        X.append(_py_features(a, b, config.fields, config.interactions))
        y.append(1.0)
    for a, b in training.get("distinct", []):
        X.append(_py_features(a, b, config.fields, config.interactions))
        y.append(0.0)
    # registry name or reference-style dotted import path (run.py:133-136)
    clf = get_classifier(config.classifier)(**config.hyperparameters)
    return clf.fit(np.array(X), np.array(y))


def create_model_definition(config: DedupeConfig, training: dict) -> dict:
    """Reference ``pgdedupe/utils.py:31-44`` parity."""
    return {
        "seed": config.seed,
        "classifier": config.classifier,
        "hyperparameters": config.hyperparameters,
        "fields": [
            # metric participates in the hash only when non-default: the
            # reference hashes the raw config field dicts (utils.py:31-44),
            # which carry a metric key only if the user wrote one — and
            # default-config hashes stay stable across this extension.
            {"field": f.field, "type": f.type, "categories": f.categories,
             "has_missing": f.has_missing,
             **({"metric": f.metric} if f.metric != "levenshtein" else {})}
            for f in config.fields
        ],
        "filter_condition": config.filter_condition,
        "interactions": [list(i) for i in config.interactions],
        "training_pairs": {
            k: [[a, b] for a, b in v] for k, v in sorted(training.items())
        },
        "recall": config.recall,
    }


def filename_friendly_hash(obj) -> str:
    """MD5 of canonical JSON (reference ``pgdedupe/utils.py:20-28``)."""

    def dt_handler(x):
        raise TypeError(f"unserializable: {type(x)}")

    return hashlib.md5(
        json.dumps(obj, default=dt_handler, sort_keys=True).encode("utf-8")
    ).hexdigest()
