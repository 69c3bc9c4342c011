from . import dedup, similarity, text  # noqa: F401
