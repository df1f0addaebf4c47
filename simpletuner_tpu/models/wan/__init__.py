from .model import Wan
from .transformer import WanConfig, WanTransformer
