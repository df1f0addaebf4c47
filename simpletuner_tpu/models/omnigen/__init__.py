from .model import OmniGen

__all__ = ["OmniGen"]
