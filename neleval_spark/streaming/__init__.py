from .ingest import (  # noqa: F401
    PAGES_SCHEMA,
    stream_construct,
    stream_doc_rates,
    stream_pages,
)
from .dedup import stream_dedup  # noqa: F401
from .intervals import stream_snapshot_runs  # noqa: F401
from .sessions import stream_host_sessions  # noqa: F401
