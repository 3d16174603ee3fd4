"""Structured Streaming layer (SURVEY.md §2.8 T1-T7, §7.1 step 6)."""

from .candles import stream_candles, stream_sliding_stats  # noqa: F401
from .stateful import stateful_ewma  # noqa: F401
