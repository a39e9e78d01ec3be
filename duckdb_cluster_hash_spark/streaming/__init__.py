from duckdb_cluster_hash_spark.streaming.events import (  # noqa: F401
    EVENTS_SCHEMA,
    stage_events_as_stream,
    stage_events_three_phase,
    read_events_stream,
    hourly_event_counts,
    sliding_window_rates,
    sessionize,
    route_events_to_nodes,
    running_user_totals,
    dedup_events_stream,
    enrich_events_with_dim,
    attribute_purchases_to_clicks,
)
