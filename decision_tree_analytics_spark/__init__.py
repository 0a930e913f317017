"""decision_tree_analytics_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the CDAP
``data-integrations/decision-tree-analytics`` plugin pair (reference at
``/root/reference``), re-expressed Spark-first:

* the reference's whole surface — decision-tree regression training +
  prediction with its exact config-validation, null-handling and
  feature-ordering contracts (``ml/``),
* the full relational operator inventory declared in SURVEY.md §2.4
  (``operators/relational.py``),
* LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis
  and multimodal-column plumbing (``operators/``),
* Structured Streaming variants of the event-stream operators
  (``streaming/``).

Everything is DataFrame/Catalyst-planned; Python UDFs appear only as
Arrow-batched pandas UDFs where built-ins cannot express the op.
"""

__version__ = "0.1.0"

from decision_tree_analytics_spark.session import get_spark, prepare_session  # noqa: F401
