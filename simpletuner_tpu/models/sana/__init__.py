from .model import Sana
