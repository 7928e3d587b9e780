from valley_tpu.ops.rope import apply_rope, rope_cos_sin
from valley_tpu.ops.attention import mha_attention, decode_attention
