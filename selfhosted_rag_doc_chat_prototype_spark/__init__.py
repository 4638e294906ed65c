"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference RAG document pipeline
(``SamD/selfhosted-rag-doc-chat-prototype``).

Everything here is idiomatic Spark: DataFrame/SQL logical plans optimized
by Catalyst, Pandas UDFs only where built-ins cannot express the
semantics, and Structured Streaming for the telemetry domain.

Layout:
    session      -- SparkSession builder tuned for the engine
    schemas      -- StructTypes for the domain tables (SURVEY.md section 1.2)
    sources/     -- table loaders, binary-file scan + format dispatch
    functions/   -- scalar/column function library (quality predicates,
                    hashing, vectors, tokens)
    operators/   -- DataFrame-level operators (analytics, dedup,
                    similarity, chunking, text stats, ingest DAG)
    streaming/   -- Structured Streaming operators (telemetry, sessions)
    plans/       -- the query registry binding operators to DuckDB oracles
"""

__version__ = "0.1.0"
