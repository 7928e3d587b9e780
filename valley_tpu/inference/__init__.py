from valley_tpu.inference.engine import (ChatSession, Engine,
                                         GenerationConfig)
from valley_tpu.inference.speculative import (SpecChatSession, SpecConfig,
                                              SpecDecoder)
