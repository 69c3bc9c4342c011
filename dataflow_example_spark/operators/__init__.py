from . import traffic, windows  # noqa: F401
