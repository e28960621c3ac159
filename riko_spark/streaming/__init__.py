from riko_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_count,
    tumbling_agg,
)
from riko_spark.streaming.dedupe import dedupe_within_watermark  # noqa: F401
from riko_spark.streaming.joins import stream_stream_join  # noqa: F401
from riko_spark.streaming.sink import UpsertSink  # noqa: F401
from riko_spark.streaming.metrics import LineageListener  # noqa: F401
