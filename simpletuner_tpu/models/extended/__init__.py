from .model import (
    BooguImage,
    StableCascade,
    LongcatImage,
    LongcatVideo,
    WanS2V,
)
