"""tpu-qwen3-tts: TPU-native Qwen3-TTS inference framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of the MLX-Swift reference
(hamptus/mlx-swift-qwen3-tts) designed TPU-first: jitted prefill + on-device
chunked decode loops, ring-buffer KV cache, static-shape vocoder, group-affine
quantization kernels, and optional (dp, tp) mesh parallelism. See SURVEY.md
for the structural map.
"""

from .config import (
    CodePredictorConfig,
    Qwen3TTSConfig,
    QuantizationSettings,
    SpeakerEncoderConfig,
    SpeechTokenizerConfig,
    TokenizerDecoderConfig,
    TokenizerEncoderConfig,
)
from .frontend.chunker import chunk as chunk_text, estimate_tokens
from .frontend.tokenizer import Qwen3Tokenizer
from .pipeline import (
    AudioChunk,
    Qwen3TTSError,
    Qwen3TTSPipeline,
    Qwen3TTSPipelineConfiguration,
)

__version__ = "0.1.0"

__all__ = [
    "AudioChunk",
    "CodePredictorConfig",
    "Qwen3TTSConfig",
    "Qwen3TTSError",
    "Qwen3TTSPipeline",
    "Qwen3TTSPipelineConfiguration",
    "QuantizationSettings",
    "SpeakerEncoderConfig",
    "SpeechTokenizerConfig",
    "TokenizerDecoderConfig",
    "TokenizerEncoderConfig",
    "Qwen3Tokenizer",
    "chunk_text",
    "estimate_tokens",
    "__version__",
]
