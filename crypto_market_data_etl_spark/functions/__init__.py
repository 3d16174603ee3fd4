"""Scalar / derive column-expression layer (SURVEY.md §2.2, §2.7)."""

from .derive import (  # noqa: F401
    best_of_book,
    dollar_bucket,
    flatten_payload,
    parse_payload,
    signed_volume,
    to_kafka_value,
    with_event_time,
    with_latency,
    with_obi,
)
