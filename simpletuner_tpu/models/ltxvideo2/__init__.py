from .model import LTXVideo2, LTX2Config, LTX2Transformer
