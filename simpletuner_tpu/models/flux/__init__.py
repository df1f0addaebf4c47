from .model import Flux
from .transformer import FluxConfig, FluxTransformer, pack_latents, unpack_latents

__all__ = ["Flux", "FluxConfig", "FluxTransformer", "pack_latents", "unpack_latents"]
