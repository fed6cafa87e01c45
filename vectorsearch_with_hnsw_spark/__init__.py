"""vectorsearch_with_hnsw_spark — a PySpark-native vector-search / analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `kamalesh003/VectorSearch-with-HNSW` (a single-machine Python
HNSW ANN engine, see SURVEY.md): distance expressions, exact and
approximate kNN, a distributed batch HNSW index (build / probe / delete /
rebuild / save / load), plus the large-scale training-data-pipeline
operators a 100 TB deployment needs (dedup, LSH similarity, text
analysis, multimodal column plumbing).

Design: declarative DataFrame plans everywhere Catalyst can optimize;
Arrow-batched pandas kernels (`applyInPandas` / `mapInPandas`) only for
the graph algorithms Spark genuinely cannot express.
"""

__version__ = "0.1.0"
