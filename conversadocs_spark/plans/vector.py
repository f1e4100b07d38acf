"""Vector query surface (reference R6-R9, R15): similarity search over
the precomputed ``embeddings`` table (determinism rule, SURVEY.md §5.2),
with provenance joins back to ``documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.knn import knn_self
from conversadocs_spark.plans.registry import register

# DuckDB-side exact cosine vs one stored vector, via explicit unnest +
# SUM(x*y) (FIXTURES.md: avoid version-dependent list_cosine_similarity).
_KNN_TOPK_ORACLE = """
WITH sims AS (
    SELECT e.vec_id,
           ROUND(
               SUM(CAST(e.x AS DOUBLE) * CAST(q.y AS DOUBLE))
               / (SQRT(SUM(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE)))
                  * SQRT(SUM(CAST(q.y AS DOUBLE) * CAST(q.y AS DOUBLE)))),
               6) AS sim
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings) e
    JOIN (SELECT unnest(embedding) AS y,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id = 0) q USING (i)
    WHERE e.vec_id <> 0
    GROUP BY e.vec_id
)
SELECT s.vec_id, s.sim, d.source
FROM (SELECT vec_id, sim FROM sims
      ORDER BY sim DESC, vec_id ASC LIMIT 3) s
LEFT JOIN documents d ON d.doc_id = s.vec_id
"""


@register("knn_topk", oracle=_KNN_TOPK_ORACLE, tags=("vector", "flagship"))
def knn_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7 minimum slice): the reference's core
    retrieval query (R9 top-k cosine + R15 provenance projection).

    Query vector = embeddings row vec_id=0; exact cosine against all
    other rows (zip_with+aggregate, codegen'd); global top-3 with
    deterministic tie-break; left join to documents for `source`.

    Plan: broadcast 1-row query side -> single scan of embeddings ->
    TakeOrderedAndProject(k=3) -> broadcast join to documents.
    No full sort, no wide shuffle: survives a 100 TB corpus.
    """
    emb = io.table(spark, sf_dir, "embeddings")
    docs = io.table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    top = knn_self(emb, query_id=0, k=3)
    return top.join(F.broadcast(docs), "vec_id", "left").select(
        "vec_id", "sim", "source"
    )
