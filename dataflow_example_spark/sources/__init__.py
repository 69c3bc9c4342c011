from . import memory, text  # noqa: F401
