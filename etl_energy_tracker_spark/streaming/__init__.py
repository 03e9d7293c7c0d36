from .jobs import hourly_event_agg_stream, incremental_upsert_stream

__all__ = ["hourly_event_agg_stream", "incremental_upsert_stream"]
