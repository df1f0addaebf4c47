from .model import PixartSigma
