from . import checkpoint, convert, io  # noqa: F401
