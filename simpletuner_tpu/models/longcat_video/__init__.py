from .model import LongcatVideo, LongCatVideoConfig, LongCatVideoTransformer
