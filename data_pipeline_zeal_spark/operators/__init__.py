from . import (  # noqa: F401
    api,
    dedup,
    etl,
    events_ext,
    hourly,
    multimodal,
    similarity,
    text,
)
