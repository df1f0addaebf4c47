from .model import SDXL
