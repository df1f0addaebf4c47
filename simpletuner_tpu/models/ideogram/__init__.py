from .model import Ideogram, IdeogramConfig, IdeogramTransformer
