from valley_tpu.inference.engine import Engine, GenerationConfig
