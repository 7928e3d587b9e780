"""valley-tpu: a TPU-native video+image multimodal assistant framework
with the capabilities of RupertLuo/Valley, built on JAX/XLA/Pallas/pjit."""

__version__ = "0.1.0"

from valley_tpu.config import (LLAMA2_7B, LLAMA2_13B, LLAMA_7B, LLAMA_13B,
                               SpecialTokens, TextConfig, ValleyConfig,
                               VisionConfig, valley_7b, valley_13b,
                               valley_tiny)
from valley_tpu.constants import *  # noqa: F401,F403
