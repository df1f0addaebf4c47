from .model import (
    BooguImage,
    LongcatImage,
    WanS2V,
)
