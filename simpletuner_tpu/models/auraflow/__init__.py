from .model import AuraFlow
