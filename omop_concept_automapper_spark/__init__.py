"""omop_concept_automapper_spark — a from-scratch, PySpark-native
knowledge-graph construction engine with the query/data-processing
capabilities of karlopintaric/omop-concept-automapper.

The reference (/root/reference, read-only) is a sequential Streamlit +
Postgres + Qdrant + OpenAI tool that links "source medical concepts" to OMOP
standard concepts via a two-stage linker (vector top-k retrieval + LLM
rerank + confidence threshold).  This package re-expresses those semantics
as a distributed, checkpointed Spark DataFrame pipeline over conversation
transcript tables:

    transcripts scan
      -> mention detection (vectorized pandas UDF + explode)
      -> salted groupBy(mention) dedup/freq
      -> deterministic embed UDF
      -> broadcast cosine top-k retrieval with metadata filter masks
      -> vectorized rerank + confidence gate
      -> connected-components canonicalization
      -> (subj, pred, obj) triples into partitioned nodes/edges tables
         with per-stage manifests for idempotent resume.

Everything here derives only from public knowledge: the PySpark API, the
reference repo's observable behavior, and published distributed-systems
papers.  No code is copied from the reference.
"""

__version__ = "0.1.0"
