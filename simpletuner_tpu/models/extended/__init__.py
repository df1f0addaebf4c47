from .model import (
    Anima,
    BooguImage,
    StableCascade,
    LongcatImage,
    LongcatVideo,
    WanS2V,
)
