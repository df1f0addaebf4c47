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
    QwenImage,
    SanaVideo,
    WanS2V,
)
