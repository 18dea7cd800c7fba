from omop_concept_automapper_spark.functions.embedder import (  # noqa: F401
    EMBED_DIM,
    embed_texts,
)
from omop_concept_automapper_spark.functions.reranker import (  # noqa: F401
    rerank_select,
    rerank_scores,
)
