"""valley-tpu: a TPU-native video+image multimodal assistant framework
with the capabilities of RupertLuo/Valley, built on JAX/XLA/Pallas/pjit."""

__version__ = "0.1.0"

from valley_tpu.config import (LLAMA2_7B, LLAMA2_13B, LLAMA_7B, LLAMA_13B,
                               SpecialTokens, TextConfig, ValleyConfig,
                               VisionConfig, valley_7b, valley_13b,
                               valley_tiny)
from valley_tpu.constants import *  # noqa: F401,F403


def __getattr__(name):
    # Lazy convenience exports (avoid importing jax at package import).
    if name in ("Engine", "GenerationConfig", "ChatSession",
                "PrefixCache"):
        from valley_tpu.inference import engine as _engine

        return getattr(_engine, name)
    if name in ("SpecDecoder", "SpecChatSession", "SpecConfig"):
        from valley_tpu.inference import speculative as _spec

        return getattr(_spec, name)
    if name == "load_valley_checkpoint":
        from valley_tpu.utils.hf_bridge import load_valley_checkpoint

        return load_valley_checkpoint
    raise AttributeError(name)
