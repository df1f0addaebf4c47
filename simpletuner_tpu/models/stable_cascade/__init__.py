from .model import StableCascade, StableCascadeConfig, StableCascadeUNet
