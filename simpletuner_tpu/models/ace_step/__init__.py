from .model import ACEStep
