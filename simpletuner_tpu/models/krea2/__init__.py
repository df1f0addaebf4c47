from .model import Krea2, Krea2Config, Krea2Transformer
