from .model import SanaVideo, SanaVideoConfig, SanaVideoTransformer
