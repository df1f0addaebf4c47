from .model import LTXVideo
