from . import decoder  # noqa: F401
