from . import textfn, vector  # noqa: F401
