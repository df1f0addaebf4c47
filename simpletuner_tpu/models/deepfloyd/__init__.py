from .model import DeepFloyd
