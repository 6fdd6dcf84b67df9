from .base import BasePress, LayerCtx, ScorerPress, topk_keep
from .knorm import KnormPress
from .random_press import RandomPress
from .streaming_llm import StreamingLLMPress

__all__ = [
    "BasePress",
    "LayerCtx",
    "ScorerPress",
    "topk_keep",
    "KnormPress",
    "RandomPress",
    "StreamingLLMPress",
]
