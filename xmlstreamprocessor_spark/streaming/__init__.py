from xmlstreamprocessor_spark.streaming.sources import (
    KAFKA_SOURCE_SCHEMA,
    stream_documents,
    stream_embeddings,
    stream_events,
    stream_kafka_xml,
    stream_xml,
)
from xmlstreamprocessor_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    sliding_distinct_users,
    tumbling_counts,
)
from xmlstreamprocessor_spark.streaming.dedup import (
    dedup_kafka_offsets,
    dedup_within_watermark,
    pair_graph_foreach_batch,
    pair_graph_state,
    stream_dedup_chunks,
    stream_dedup_minhash,
)
from xmlstreamprocessor_spark.streaming.stateful import (
    sessionize_event_time,
    sessionize_stateful,
)
from xmlstreamprocessor_spark.streaming.pipeline import (
    keeper_set,
    mix_predicate,
    pipeline_stream_dedup_mix_pack,
)
from xmlstreamprocessor_spark.streaming.packer import (
    pack_batch_greedy,
    pack_stream_stateful,
)
from xmlstreamprocessor_spark.streaming.joins import (
    enrich_stream_static,
    join_purchases_to_views,
)
from xmlstreamprocessor_spark.streaming.index import (
    stream_index_assign,
)

__all__ = [
    "KAFKA_SOURCE_SCHEMA",
    "stream_documents",
    "stream_events",
    "stream_kafka_xml",
    "stream_xml",
    "tumbling_counts",
    "sliding_counts",
    "sliding_distinct_users",
    "session_counts",
    "dedup_within_watermark",
    "dedup_kafka_offsets",
    "pair_graph_foreach_batch",
    "pair_graph_state",
    "stream_dedup_chunks",
    "stream_dedup_minhash",
    "sessionize_stateful",
    "sessionize_event_time",
    "enrich_stream_static",
    "join_purchases_to_views",
    "pack_stream_stateful",
    "pack_batch_greedy",
    "keeper_set",
    "mix_predicate",
    "pipeline_stream_dedup_mix_pack",
    "stream_index_assign",
    "stream_embeddings",
]
