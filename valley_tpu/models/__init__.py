from valley_tpu.models import clip_vit, llama, temporal, valley
