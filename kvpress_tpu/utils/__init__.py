from .checkpoint import load_params, save_params
from .profiling import memory_stats, profile_trace

__all__ = ["load_params", "save_params", "memory_stats", "profile_trace"]
