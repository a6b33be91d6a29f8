from . import cdc, funnel, observability, pipeline  # noqa: F401
