from .transformer import Cosmos1Config, Cosmos1Transformer
