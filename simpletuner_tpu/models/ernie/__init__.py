from .model import Ernie, ErnieConfig, ErnieTransformer
