"""mrgo_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference engine
(vksysd/mrgo, a MapReduce dataflow + linearizable KV op-log stack;
see SURVEY.md) on idiomatic Spark (DataFrame/SQL/Catalyst/Structured
Streaming), plus LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    session    — tuned SparkSession factory
    sources    — table loaders / schemas for the test fixtures
    functions  — reusable column expressions (text, vectors)
    operators  — the operator library (mrapps, kv, dedup, similarity,
                 textstats, relational, mr compat, multimodal)
    streaming  — Structured Streaming variants (windows, stateful fold)
    plans      — plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
