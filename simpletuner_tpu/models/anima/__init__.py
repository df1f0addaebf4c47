from .model import Anima, AnimaConfig, AnimaTransformer
