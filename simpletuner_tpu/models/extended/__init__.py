from .model import (
    BooguImage,
    WanS2V,
)
