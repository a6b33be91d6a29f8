from . import skew, textfn, vector, zorder  # noqa: F401
