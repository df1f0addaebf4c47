from .model import Kolors
