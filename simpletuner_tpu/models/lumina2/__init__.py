from .model import Lumina2
