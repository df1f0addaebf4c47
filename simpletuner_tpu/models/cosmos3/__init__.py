from .model import Cosmos3
