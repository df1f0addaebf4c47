from .model import SD3
from .transformer import SD3Config, SD3Transformer
