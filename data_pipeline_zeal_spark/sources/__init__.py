from . import generator  # noqa: F401
