from .attention import attention_bias, gqa_attention, window_attention_probs

__all__ = ["attention_bias", "gqa_attention", "window_attention_probs"]
