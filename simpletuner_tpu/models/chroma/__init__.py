from .model import Chroma
