from . import api, dedup, etl, hourly, similarity, text  # noqa: F401
