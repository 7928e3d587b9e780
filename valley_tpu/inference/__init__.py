from valley_tpu.inference.engine import Engine, GenerationConfig
from valley_tpu.inference.speculative import SpecConfig, SpecDecoder
