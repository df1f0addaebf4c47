from .model import HeartMuLa

__all__ = ["HeartMuLa"]
