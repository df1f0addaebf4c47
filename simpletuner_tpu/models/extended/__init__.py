from .model import (
    Anima,
    BooguImage,
    StableCascade,
    Ideogram,
    LongcatImage,
    LongcatVideo,
    SanaVideo,
    WanS2V,
)
