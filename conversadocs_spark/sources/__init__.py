"""Multi-format document ingestion + index sink (reference R1-R3,
R7-R8)."""

from conversadocs_spark.sources.ingest import (  # noqa: F401
    EXTENSIONS,
    scan_documents,
    stage_text_corpus,
)
from conversadocs_spark.sources.sink import (  # noqa: F401
    build_vector_index,
    write_index_overwrite,
)
