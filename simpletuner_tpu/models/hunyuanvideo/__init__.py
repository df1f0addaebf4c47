from .model import HunyuanVideo
