from valley_tpu.inference.engine import (ChatSession, Engine,
                                         GenerationConfig, PrefixCache)
from valley_tpu.inference.speculative import (SpecChatSession, SpecConfig,
                                              SpecDecoder)
