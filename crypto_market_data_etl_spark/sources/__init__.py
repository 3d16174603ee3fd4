"""Source/sink builders (SURVEY.md §2.1 S1-S8)."""

from .files import read_partitioned, read_raw_archive, write_partitioned  # noqa: F401
from .kafka import (  # noqa: F401
    kafka_batch_reader,
    kafka_offsets_json,
    kafka_stream_reader,
    kafka_stream_writer,
)
from .kafka_mock import (  # noqa: F401
    KAFKA_SOURCE_SCHEMA,
    mock_offsets_for_times,
    read_kafka_log,
    read_kafka_log_stream,
    write_kafka_log,
)
