"""conversadocs_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of R3gm/ConversaDocs, re-expressed
Spark-first (DataFrame/SQL on Catalyst, Structured Streaming, MLlib).

The reference (/root/reference, R3gm/ConversaDocs) is a single-process
RAG pipeline: multi-format document ingest -> recursive chunk split ->
sentence-transformer embed -> in-memory exact-cosine vector store ->
top-k retrieval -> LLM synthesis (see SURVEY.md). This package provides
those operator semantics as distributed, Catalyst-optimizable DataFrame
pipelines, plus the relational substrate and the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) that a 100 TB deployment needs.

Layout:
    session.py    SparkSession builder tuned for the engine
    io.py         parquet table catalog for the test fixtures
    functions/    pure column-expression builders (vector math, text)
    operators/    composite operators (knn, dedup, asof, similarity join)
    plans/        the declared query surface (registry of query+oracle)
    sources/      multi-format document ingestion (reference R1-R3)
    streaming/    Structured Streaming surface (windows, session state)
"""

__version__ = "0.1.0"
