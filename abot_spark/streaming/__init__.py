from abot_spark.streaming.ingest import (  # noqa: F401
    discovery_rate_stream, doc_dedup_stream, page_extract_stream,
    seed_ingest_stream,
)
from abot_spark.streaming.stateful import (  # noqa: F401
    politeness_pacing_stream,
)
