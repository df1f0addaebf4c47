from .model import Cosmos2Image  # noqa: F401
