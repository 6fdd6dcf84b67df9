"""Multimodal (Gemma3) pipeline: compress a context that contains images.

The vision tower (SigLIP) + projector run as JAX (models/siglip.py) — torch
is only used once at conversion. The reference compresses
Gemma3ForConditionalGeneration via its forward hooks
(kvpress/presses/base_press.py:197-202); here the projected image features
are scattered into the text embedding and the press compresses image and
text KV rows alike. A tiny random HF model stands in for a hub download.

Run: JAX_PLATFORMS=cpu python examples/multimodal_gemma3.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import numpy as np

from kvpress_tpu import KnormPress
from kvpress_tpu.pipeline import KVPressPipeline
from toy_tokenizer import ToyTokenizer

IMAGE_TOKEN_ID = 500


class ImageTokenizer(ToyTokenizer):
    """Maps the literal word ``<image>`` to the Gemma3 placeholder id; a real
    setup uses AutoProcessor, which expands each image to
    mm_tokens_per_image placeholders."""

    def _tok2id(self, tok):
        return IMAGE_TOKEN_ID if tok == "<image>" else super()._tok2id(tok)


def tiny_gemma3():
    import torch
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration
    from transformers.models.gemma3 import Gemma3TextConfig
    from transformers.models.siglip import SiglipVisionConfig

    torch.manual_seed(0)
    vc = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14)
    tc = Gemma3TextConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=16, pad_token_id=0, bos_token_id=1,
                          eos_token_id=2, sliding_window=8,
                          max_position_embeddings=512,
                          tie_word_embeddings=False)
    return Gemma3ForConditionalGeneration(Gemma3Config(
        text_config=tc, vision_config=vc, mm_tokens_per_image=4,
        image_token_index=IMAGE_TOKEN_ID, boi_token_index=498,
        eoi_token_index=499)).eval()


def main():
    model = tiny_gemma3()
    # attn_impl="xla": bidirectional image-span attention (the flash prefill
    # kernel keeps image tokens causal — HF token_type_ids=None semantics)
    pipe = KVPressPipeline.from_torch_multimodal(
        model, ImageTokenizer(vocab_size=498), attn_impl="xla"
    )
    del model  # inference is torch-free from here

    # One image = mm_tokens_per_image placeholder words in the context.
    context = (
        " ".join(f"fact{i}" for i in range(24))
        + " <image> <image> <image> <image> "
        + " ".join(f"detail{i}" for i in range(8))
    )
    pixel_values = np.random.default_rng(0).standard_normal(
        (1, 3, 28, 28)
    ).astype(np.float32)

    out = pipe(
        context,
        question="describe the image",
        pixel_values=pixel_values,
        press=KnormPress(compression_ratio=0.5),
        max_new_tokens=8,
    )
    print("answer:", out["answer"])


if __name__ == "__main__":
    main()
