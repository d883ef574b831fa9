"""Structured Streaming layer.

The reference is a batch system, but three of its behaviors are
streaming-shaped (SURVEY §2.8): a landing directory that grows over time,
consume-once session dispatch, and event-time stamps on every record.
This package gives them their native Spark expression: file-source
streams with availableNow incremental catch-up, watermarked event-time
windows, and custom stateful operators.
"""

from sig_etl_spark.streaming.pipeline import (  # noqa: F401
    DOCUMENT_SCHEMA,
    EMBEDDING_SCHEMA,
    EVENT_SCHEMA,
    SNAPSHOT_SCHEMA,
    collect_ivf_index,
    read_document_stream,
    read_embedding_stream,
    read_event_stream,
    read_snapshot_stream,
    collect_bigram_model,
    collect_boilerplate_segments,
    read_warc_stream,
    stream_crawl_curation,
    stream_decontaminate,
    stream_ivf_assign,
    stream_quality_gate,
    stream_scrub,
    run_available_now,
    running_user_totals,
    session_windows,
    stateful_sessionize,
    stream_cms_registers,
    stream_corpus_near_dup,
    stream_dedup,
    stream_hll_distinct,
    stream_interval_union,
    stream_kmv_distinct,
    stream_enrich,
    stream_scd2,
    stream_stream_join,
    windowed_counts,
)
