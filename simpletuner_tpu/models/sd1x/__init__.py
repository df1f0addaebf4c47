from .model import SD1x, SD2x
