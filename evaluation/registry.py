"""Dataset / scorer / press registries (reference evaluation/evaluate_registry.py:51-135)."""

from __future__ import annotations

from kvpress_tpu.presses import (
    AdaKVPress,
    DuoAttentionPress,
    ExpectedAttentionStatsPress,
    FastKVzipPress,
    KVComposePress,
    KVzipPress,
    RestoreKVPress,
    BlockPress,
    CAMPress,
    CapPress,
    ChunkKVPress,
    ChunkPress,
    CompactorPress,
    ComposedPress,
    CriticalAdaKVPress,
    CriticalKVPress,
    CURPress,
    DecodingPress,
    DMSPress,
    ExpectedAttentionPress,
    FinchPress,
    KeyDiffPress,
    KnormPress,
    KVzapPress,
    LagKVPress,
    LUKVPress,
    MergingPress,
    ObservedAttentionPress,
    PyramidKVPress,
    QFilterPress,
    RandomPress,
    SnapKVPress,
    StreamingLLMPress,
    ThinKPress,
    TOVAPress,
)

from metrics import (
    boxed_metrics,
    infinitebench_metrics,
    longbench_e_metrics,
    longbench_metrics,
    longbenchv2_metrics,
    loogle_metrics,
    needle_metrics,
    ruler_metrics,
    zero_scrolls_metrics,
)

DATASET_REGISTRY = {
    "loogle": "simonjegou/loogle",
    "ruler": "simonjegou/ruler",
    "zero_scrolls": "simonjegou/zero_scrolls",
    "infinitebench": "MaxJeblick/InfiniteBench",
    "longbench": "Xnhyacinth/LongBench",
    "longbench-e": "Xnhyacinth/LongBench",
    "longbench-v2": "simonjegou/LongBench-v2",
    "needle_in_haystack": "alessiodevoto/paul_graham_essays",
    "aime25": "alessiodevoto/aime25",
    "math500": "alessiodevoto/math500",
}

SCORER_REGISTRY = {
    "loogle": loogle_metrics,
    "ruler": ruler_metrics,
    "zero_scrolls": zero_scrolls_metrics,
    "infinitebench": infinitebench_metrics,
    "longbench": longbench_metrics,
    "longbench-e": longbench_e_metrics,
    "longbench-v2": longbenchv2_metrics,
    "needle_in_haystack": needle_metrics,
    "aime25": boxed_metrics,
    "math500": boxed_metrics,
}

# Preconfigured presses; hub-artifact presses (QFilter/KVzap/LUKV) take their
# artifacts via --press_artifact (loaded in evaluate.py).
PRESS_REGISTRY = {
    "adakv_snapkv": AdaKVPress(press=SnapKVPress()),
    "block_keydiff": BlockPress(press=KeyDiffPress(), block_size=128),
    "cap": CapPress(),
    "chunkkv": ChunkKVPress(press=SnapKVPress(), chunk_length=20),
    "compactor": CompactorPress(),
    "adakv_compactor": AdaKVPress(press=CompactorPress()),
    "critical_adakv_expected_attention": CriticalAdaKVPress(
        press=ExpectedAttentionPress(use_vnorm=False)
    ),
    "critical_adakv_snapkv": CriticalAdaKVPress(press=SnapKVPress()),
    "critical_expected_attention": CriticalKVPress(
        press=ExpectedAttentionPress(use_vnorm=False)
    ),
    "critical_snapkv": CriticalKVPress(press=SnapKVPress()),
    "cur": CURPress(),
    "expected_attention": AdaKVPress(press=ExpectedAttentionPress(epsilon=1e-2)),
    "finch": FinchPress(),
    "keydiff": KeyDiffPress(),
    "knorm": KnormPress(),
    "kvzap_linear": DMSPress(press=KVzapPress()),
    "kvzap_mlp": DMSPress(press=KVzapPress()),
    "kvzap_mlp_head": KVzapPress(),
    "kvzap_mlp_layer": AdaKVPress(press=KVzapPress()),
    "lagkv": LagKVPress(),
    "lukv": LUKVPress(press=ExpectedAttentionPress(epsilon=2e-2), sink=4, window=1),
    "observed_attention": ObservedAttentionPress(),
    "pyramidkv": PyramidKVPress(),
    "qfilter": QFilterPress(),
    "random": RandomPress(),
    "snap_think": ComposedPress(presses=(SnapKVPress(), ThinKPress())),
    "snapkv": SnapKVPress(),
    "streaming_llm": StreamingLLMPress(),
    "think": ThinKPress(),
    "tova": TOVAPress(),
    "duo_attention": DuoAttentionPress(),
    # head scores computed at setup from the first dataset contexts
    # (reference duo_attention_on_the_fly downloads booksum samples)
    "duo_attention_on_the_fly": DuoAttentionPress(),
    "expected_attention_stats": ExpectedAttentionStatsPress(),
    "fastkvzip": FastKVzipPress(),
    "kvcompose": KVComposePress(),
    "kvcompose_unstructured": KVComposePress(structured=False),
    "kvzip": KVzipPress(),
    "kvzip_plus": KVzipPress(kvzip_plus_normalization=True),
    "RestoreKV": RestoreKVPress(),
    "RestoreKV_plus": RestoreKVPress(kvzip_plus_normalization=True),
    "no_press": None,
    "cam_streaming_llm": CAMPress(base_press=StreamingLLMPress()),
    "cam_knorm": CAMPress(base_press=KnormPress()),
    "cam_tova": CAMPress(base_press=TOVAPress()),
    "decoding_knorm": DecodingPress(base_press=KnormPress()),
    "decoding_streaming_llm": DecodingPress(base_press=StreamingLLMPress()),
    "decoding_tova": DecodingPress(base_press=TOVAPress()),
    "decoding_keydiff": DecodingPress(base_press=KeyDiffPress()),
    "merging_knorm": MergingPress(press=KnormPress()),
    "merging_snapkv": MergingPress(press=SnapKVPress()),
    "merging_expected_attention": MergingPress(
        press=ExpectedAttentionPress(epsilon=1e-2)
    ),
    "chunk_knorm": ChunkPress(press=KnormPress(), chunk_length=1024),
}
