from .model import Flux2
