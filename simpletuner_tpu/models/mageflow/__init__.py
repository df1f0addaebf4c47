from .model import MageFlow, ZImage
