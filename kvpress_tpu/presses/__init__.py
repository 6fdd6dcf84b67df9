from .base import BasePress, LayerCtx, ScorerPress, topk_keep
from .cur import CURPress
from .expected_attention import ExpectedAttentionPress
from .keydiff import KeyDiffPress
from .knorm import KnormPress
from .lagkv import LagKVPress
from .qfilter import QFilterPress, load_q_filters
from .random_press import RandomPress
from .snapkv import (
    ObservedAttentionPress,
    PyramidKVPress,
    SnapKVPress,
    TOVAPress,
)
from .decoding import (
    CompressionRatioDecodingPress,
    DecodingPress,
    PrefillDecodingPress,
)
from .cam import CAMPress
from .cap import CapPress
from .compactor import CompactorPress, LeverageScorePress, NonCausalAttnPress
from .dms import DMSPress
from .finch import FinchPress
from .duo import DuoAttentionPress, load_duo_head_scores
from .expected_attention_stats import (
    ExpectedAttentionStatsPress,
    load_query_stats,
    save_query_stats,
)
from .fastkvzip import (
    FastKVzipPress,
    init_random_gates,
    load_fastkvzip_gates,
    save_fastkvzip_gates,
)
from .kvzap import KVzapPress, load_kvzap_model, save_kvzap_model
from .kvzip import KVzipPress
from .kvcompose import KVComposePress
from .restorekv import (
    RestoreKVPress,
    init_random_lora,
    load_restore_artifacts,
    save_restore_artifacts,
)
from .lukv import LUKVPress, load_budget_curve
from .merging import MergingPress
from .simlayerkv import SimLayerKVPress
from .streaming_llm import StreamingLLMPress
from .wrappers import (
    AdaKVPress,
    BlockPress,
    ChunkKVPress,
    ChunkPress,
    ComposedPress,
    CriticalAdaKVPress,
    CriticalKVPress,
    KeyRerotationPress,
    PerLayerCompressionPress,
    ThinKPress,
)

__all__ = [
    "CAMPress",
    "CapPress",
    "CompactorPress",
    "LeverageScorePress",
    "NonCausalAttnPress",
    "KVzapPress",
    "KVzipPress",
    "KVComposePress",
    "FastKVzipPress",
    "init_random_gates",
    "load_fastkvzip_gates",
    "save_fastkvzip_gates",
    "RestoreKVPress",
    "init_random_lora",
    "load_restore_artifacts",
    "save_restore_artifacts",
    "load_kvzap_model",
    "save_kvzap_model",
    "DuoAttentionPress",
    "load_duo_head_scores",
    "ExpectedAttentionStatsPress",
    "load_query_stats",
    "save_query_stats",
    "LUKVPress",
    "load_budget_curve",
    "MergingPress",
    "SimLayerKVPress",
    "DMSPress",
    "FinchPress",
    "CompressionRatioDecodingPress",
    "DecodingPress",
    "PrefillDecodingPress",
    "AdaKVPress",
    "BlockPress",
    "ChunkKVPress",
    "ChunkPress",
    "ComposedPress",
    "CriticalAdaKVPress",
    "CriticalKVPress",
    "KeyRerotationPress",
    "PerLayerCompressionPress",
    "ThinKPress",
    "BasePress",
    "LayerCtx",
    "ScorerPress",
    "topk_keep",
    "CURPress",
    "ExpectedAttentionPress",
    "KeyDiffPress",
    "KnormPress",
    "LagKVPress",
    "QFilterPress",
    "load_q_filters",
    "RandomPress",
    "ObservedAttentionPress",
    "PyramidKVPress",
    "SnapKVPress",
    "TOVAPress",
    "StreamingLLMPress",
]
