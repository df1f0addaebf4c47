from .model import (
    Anima,
    Ideogram,
    KandinskyImage,
    KandinskyVideo,
    LongcatImage,
    LongcatVideo,
    QwenImage,
    SanaVideo,
)
