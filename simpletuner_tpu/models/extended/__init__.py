from .model import (
    Anima,
    BooguImage,
    Ernie,
    StableCascade,
    Ideogram,
    KandinskyImage,
    KandinskyVideo,
    LongcatImage,
    LongcatVideo,
    SanaVideo,
    WanS2V,
)
