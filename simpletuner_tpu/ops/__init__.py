from .attention import (
    dot_product_attention,
    get_attention_backend,
    set_attention_backend,
)
from .flash_attention import SEGMENT_PAD_ID, flash_attention, mha_reference
from .rope import apply_rope, axial_rope, rope_frequencies

__all__ = [
    "dot_product_attention",
    "get_attention_backend",
    "set_attention_backend",
    "SEGMENT_PAD_ID",
    "flash_attention",
    "mha_reference",
    "apply_rope",
    "axial_rope",
    "rope_frequencies",
]
