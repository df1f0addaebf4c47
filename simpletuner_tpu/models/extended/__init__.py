from .model import (
    Anima,
    BooguImage,
    Ernie,
    StableCascade,
    Ideogram,
    LongcatImage,
    LongcatVideo,
    SanaVideo,
    WanS2V,
)
