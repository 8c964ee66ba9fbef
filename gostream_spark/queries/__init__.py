"""Query catalog: importing this package registers every implemented
query from SURVEY.md §2 into ``gostream_spark.registry``."""

from gostream_spark.queries import (  # noqa: F401
    aggregation,
    aggregation_extra,
    analytics_demo,
    corpus_ops,
    dedup_advanced,
    event_time,
    flagship,
    joins,
    kmeans_demo,
    llm_similarity,
    llm_text,
    multimodal,
    projection,
    scalar_functions,
    scalar_functions_extra,
    skew_and_ivf,
    sources_sinks,
    sql_entry,
    streaming_queries,
    streaming_similarity,
    training_assembly,
    udfs,
    windows,
)
