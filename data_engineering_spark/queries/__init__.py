"""Named query surface (driver contract).

Importing this package registers every query + oracle into
`data_engineering_spark.registry`.
"""

from data_engineering_spark.queries import (  # noqa: F401
    classifier,
    collections,
    curation,
    decontaminate,
    diagnostics,
    events_analytics,
    events_cdc,
    export_prep,
    fusion,
    graph,
    linkage,
    llm_filters,
    multimodal,
    profiling,
    prune_skew,
    reconcile,
    resample,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    quality_checks,
    sampling,
    scd,
    sft,
    similarity,
    sketch_algebra,
    text,
    training_mix,
    timeseries,
    timeseries2,
    unigram,
    wordpiece,
)
from data_engineering_spark.registry import ORACLES, QUERIES  # noqa: F401
