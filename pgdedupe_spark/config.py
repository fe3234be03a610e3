"""Pipeline configuration — the user-facing "query language"
(SURVEY.md §1.3; reference ``config.yaml`` + ``pgdedupe/run.py:13-59``).

Same keys and defaults as the reference's ``process_options``:
required ``schema, table, key, fields`` (run.py:24-27); defaults threshold
0.5, recall 0.90, classifier logistic regression (run.py:29-42);
``merge_exact`` normalized to list-of-lists (run.py:45-48); projection
column list derived from fields + key (run.py:56-58 — the reference builds a
Python *set* there, which is hash-order nondeterministic; we sort for
reproducibility, as SURVEY §1.3 prescribes).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from pgdedupe_spark.operators.features import FieldDef


def load_config(path: str) -> dict:
    """YAML or JSON by extension (reference ``pgdedupe/utils.py:9-17``)."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


@dataclass
class DedupeConfig:
    table: str
    key: str
    fields: list[FieldDef]
    schema: str = "dedupe"
    interactions: list[tuple[str, str]] = dc_field(default_factory=list)
    filter_condition: str = "1=1"
    merge_exact: list[list[str]] = dc_field(default_factory=list)
    threshold: float = 0.5
    recall: float = 0.90
    classifier: str = "logistic_regression"
    hyperparameters: dict[str, Any] = dc_field(default_factory=dict)
    seed: int = 0
    # the load-bearing skew guard (SCALE.md r9: "AQE skew-join won't save a
    # quadratic block") — caps candidate-pair blocks before the self-join
    max_block_size: int | None = 10000
    # the giant-component HAC guard (VERDICT r9 #1) — components past this
    # fall back to CC-label-as-cluster instead of the O(m²) linkage matrix
    max_component_size: int | None = 10000

    @property
    def field_names(self) -> list[str]:
        # sorted for determinism (vs the reference's set, run.py:56-58)
        return sorted({f.field for f in self.fields})

    @classmethod
    def from_dict(cls, d: dict) -> "DedupeConfig":
        for k in ("table", "key", "fields"):
            if k not in d:
                raise ValueError(f"missing required config key: {k}")
        fields = [
            FieldDef(
                field=f["field"],
                type=f.get("type", "String"),
                categories=f.get("categories", []),
                has_missing=bool(f.get("has missing", f.get("has_missing", False))),
                # per-field comparator choice (features.py:44): the
                # affine-gap fidelity option is reachable from YAML
                # (was silently dropped pre-r10 — VERDICT r9 missing #2)
                metric=f.get("metric", "levenshtein"),
            )
            for f in d["fields"]
        ]
        me = d.get("merge_exact", [])
        if me and not isinstance(me[0], list):  # normalize (run.py:45-48)
            me = [me]
        return cls(
            table=d["table"],
            key=d["key"],
            fields=fields,
            schema=d.get("schema", "dedupe"),
            interactions=[tuple(i) for i in d.get("interactions", [])],
            filter_condition=d.get("filter_condition", "1=1"),
            merge_exact=me,
            threshold=d.get("threshold", 0.5),
            recall=d.get("recall", 0.90),
            classifier=d.get("classifier", "logistic_regression"),
            hyperparameters=d.get("hyperparameters", {}),
            seed=d.get("seed", 0),
            max_block_size=d.get("max_block_size", 10000),
            max_component_size=d.get("max_component_size", 10000),
        )
