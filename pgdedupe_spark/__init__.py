"""pgdedupe_spark — a PySpark-native record-deduplication / record-linkage
engine with the query and data-processing capabilities of ``dssg/pgdedupe``
(reference: /root/reference), re-designed Spark-first for 100 TB scale.

The reference is a thin Python layer emitting PostgreSQL SQL plus the public
``dedupe`` library (see SURVEY.md). This package re-expresses every stage of
that 7-stage dataflow as pure DataFrame transformations:

    source ─filter─collapse─▶ entries_unique          (operators/collapse.py)
          ─block keys──────▶ blocking chain           (operators/blocking.py)
          ─pair gen────────▶ candidate pairs          (operators/pairs.py)
          ─feature+score───▶ scored pairs             (operators/features.py, scoring.py)
          ─CC + HAC────────▶ entity_map               (operators/clustering.py)
          ─writeback───────▶ map / unique_map / ids   (pipeline.py)
          ─exact merge─────▶ cluster relabels         (operators/exact_merge.py)

Beyond reference parity it adds the large-scale training-data-pipeline
operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, multimodal column
plumbing, and Structured-Streaming dedup (operators/dedup.py, similarity.py,
text.py, multimodal.py, streaming/).
"""

__version__ = "0.1.0"

from pgdedupe_spark.session import get_spark  # noqa: F401
