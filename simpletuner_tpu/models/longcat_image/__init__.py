from .model import LongcatImage  # noqa: F401
