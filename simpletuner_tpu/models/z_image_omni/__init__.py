from .model import ZImageOmni, ZImageOmniConfig, ZImageOmniTransformer

__all__ = ["ZImageOmni", "ZImageOmniConfig", "ZImageOmniTransformer"]
