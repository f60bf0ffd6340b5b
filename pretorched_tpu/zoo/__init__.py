from . import convert, io  # noqa: F401
