"""The composed RAG query lifecycle — the reference's identity.

Two end-to-end pipelines, both fully deterministic (mock-LLM
expressions, functions/mockllm.py) and therefore oracle-checkable:

- ``rag_answer_pipeline``: R10 condense -> R9 retrieve top-k ->
  R11 stuff-concat -> answer, matching the ConversationalRetrievalChain
  lifecycle at /root/reference/conversadocs/bones.py:77-87 and
  bones.py:123-144 (condense rewrites (history, question) into the
  generated_question that actually hits the retriever; the k retrieved
  chunks are concatenated into one prompt; one call yields the answer;
  sources are projected for provenance, R15).
- ``summarize_mapreduce``: R14 map-reduce summarization
  (bones.py:146-169): split -> map-summarize each chunk -> hierarchical
  combine. The oracle-checked query is the fixed two-level tree
  (valid while every fixture doc yields <= 16 chunks, i.e. text <=
  1,300 chars — generator caps docs well under that at every sf); the
  general iterate-until-one operator is operators/reduce.py, exercised
  by tests/test_reduce.py.

Scale shape: the query batch is tiny (broadcast); the corpus never
shuffles for retrieval; stuff is a k-row-per-query grouped concat; the
summarize tree shrinks geometrically per level. Each stage survives a
100 TB corpus unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.functions.mockllm import (
    mock_answer,
    mock_condense,
    mock_summarize,
    sql_mock_answer,
    sql_mock_condense,
    sql_mock_summarize,
)
from conversadocs_spark.operators.chunker import split_fixed
from conversadocs_spark.operators.knn import knn_per_query
from conversadocs_spark.plans.registry import register

# --------------------------------------------------------------------------
# R10 + R9 + R11: condense -> retrieve -> stuff -> answer
# --------------------------------------------------------------------------

_RAG_ORACLE = f"""
WITH q AS (
    SELECT d.doc_id AS query_id,
           {sql_mock_condense("d.source", "d.text")} AS generated_question
    FROM documents d
    WHERE d.doc_id < 5
),
sims AS (
    SELECT a.vec_id AS query_id, b.vec_id,
           round(SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE))
           / (SQRT(SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE)))
              * SQRT(SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE)))), 6)
               AS sim
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id < 5) a
    JOIN (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id >= 5) b USING (i)
    GROUP BY a.vec_id, b.vec_id
),
ranked AS (
    SELECT query_id, vec_id, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id ASC) AS rank
    FROM sims
),
stuffed AS (
    SELECT r.query_id,
           string_agg(d.text, chr(10) || chr(10) ORDER BY r.rank)   AS context,
           string_agg(d.source, ',' ORDER BY r.rank)                AS sources,
           count(*)                                  AS n_sources
    FROM ranked r
    JOIN documents d ON d.doc_id = r.vec_id
    WHERE r.rank <= 3
    GROUP BY r.query_id
)
SELECT q.query_id, q.generated_question,
       {sql_mock_answer("q.generated_question", "s.context")} AS answer,
       s.sources, s.n_sources,
       length(s.context) AS context_len
FROM q JOIN stuffed s USING (query_id)
"""


@register("rag_answer_pipeline", oracle=_RAG_ORACLE, tags=("rag", "bench"))
def rag_answer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """condense -> retrieve -> stuff -> answer, end to end.

    - Questions: documents doc_id<5 (their text), with `source` standing
      in for the session chat history fed to the condenser.
    - Condense (R10): generated_question = mock_condense(history, q) —
      the retrieval key depends on history+question, like the chain.
    - Retrieve (R9): per-query exact cosine top-3 over the corpus
      (embeddings vec_id>=5); query side broadcast, corpus scanned once.
    - Stuff (R11): rank-ordered concat of the 3 chunk texts.
    - Answer + provenance (R18/R15): digest bound to question+context,
      sources projected in rank order.
    """
    docs = io.table(spark, sf_dir, "documents")
    emb = io.table(spark, sf_dir, "embeddings")

    questions = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        mock_condense(F.col("source"), F.col("text")).alias(
            "generated_question"
        ),
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)

    retrieved = knn_per_query(corpus, queries, k=3)

    chunk_texts = docs.select(
        F.col("doc_id").alias("vec_id"), "text", "source"
    )
    stuffed = (
        retrieved.join(F.broadcast(chunk_texts), "vec_id")
        .groupBy("query_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "text"))),
                    lambda s: s["text"],
                ),
                "\n\n",
            ).alias("context"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", "source"))
                    ),
                    lambda s: s["source"],
                ),
                ",",
            ).alias("sources"),
            F.count("*").alias("n_sources"),
        )
    )
    return (
        questions.join(stuffed, "query_id")
        .select(
            "query_id",
            "generated_question",
            mock_answer(F.col("generated_question"), F.col("context")).alias(
                "answer"
            ),
            "sources",
            "n_sources",
            F.length("context").alias("context_len"),
        )
    )


# --------------------------------------------------------------------------
# R14: map-reduce summarization (fixed two-level tree, oracle-checked)
# --------------------------------------------------------------------------

_SUMMARIZE_ORACLE = f"""
WITH chunks AS (
    SELECT d.doc_id, CAST(g.i AS BIGINT) AS seq,
           substring(d.text, CAST(g.i * 80 + 1 AS INTEGER), 100) AS chunk
    FROM documents d
    JOIN (SELECT unnest(range(0, 100)) AS i) g
      ON g.i * 80 < length(d.text)
),
mapped AS (
    SELECT doc_id, seq,
           {sql_mock_summarize("chunk")} AS partial
    FROM chunks
),
level1 AS (
    SELECT doc_id, seq // 4 AS g1,
           {sql_mock_summarize(
               "string_agg(partial, chr(10) ORDER BY seq)"
           )} AS partial,
           count(*) AS n
    FROM mapped
    GROUP BY doc_id, seq // 4
)
SELECT doc_id,
       {sql_mock_summarize(
           "string_agg(partial, chr(10) ORDER BY g1)"
       )} AS summary,
       CAST(sum(n) AS BIGINT)  AS n_chunks,
       count(*)                AS n_partials
FROM level1
GROUP BY doc_id
"""


@register(
    "summarize_mapreduce", oracle=_SUMMARIZE_ORACLE, tags=("rag",)
)
def summarize_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-reduce summarize (R14) as a fixed two-level tree:
    chunk (fixed grid 100/20) -> map mock-summarize -> combine groups
    of 4 -> combine per doc. Two grouped aggregations; each level's
    payload is strictly smaller — the treeAggregate shape. The
    iterate-until-one general form is operators/reduce.py
    (hierarchical_reduce), equivalence-tested against this plan."""
    docs = io.table(spark, sf_dir, "documents")
    chunks = split_fixed(docs, chunk_size=100, overlap=20)
    mapped = chunks.select(
        "doc_id", "seq", mock_summarize(F.col("chunk")).alias("partial")
    )

    def ordered_concat(seq_col: str) -> F.Column:
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(seq_col, "partial"))),
                lambda s: s["partial"],
            ),
            "\n",
        )

    level1 = (
        mapped.groupBy(
            "doc_id", (F.col("seq") / 4).cast("long").alias("g1")
        )
        .agg(
            mock_summarize(ordered_concat("seq")).alias("partial"),
            F.count("*").alias("n"),
        )
    )
    return level1.groupBy("doc_id").agg(
        mock_summarize(ordered_concat("g1")).alias("summary"),
        F.sum("n").alias("n_chunks"),
        F.count("*").alias("n_partials"),
    )
