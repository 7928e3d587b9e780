"""High-level offline inference API: prompt building, response cleanup,
`completion()` — parity with `ValleyLlamaForCausalLM.build_inputs /
process_response / completion` (`valley/model/valley_model.py:381-439`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from valley_tpu.config import ValleyConfig
from valley_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                  DEFAULT_IM_START_TOKEN,
                                  DEFAULT_IMAGE_PATCH_TOKEN,
                                  DEFAULT_NUM_FRAMES,
                                  DEFAULT_VI_END_TOKEN,
                                  DEFAULT_VI_START_TOKEN,
                                  DEFAULT_VIDEO_FRAME_TOKEN)
from valley_tpu.inference.engine import Engine, GenerationConfig


def media_replace_token(num_patches: int = 256,
                        num_frames: int = DEFAULT_NUM_FRAMES) -> str:
    """The expansion of <video>/<image> into marker tokens
    (`valley_model.py:387-389`); patch/frame counts are config-derived
    instead of the reference's hardcoded 256/8."""
    return (DEFAULT_IM_START_TOKEN
            + DEFAULT_IMAGE_PATCH_TOKEN * num_patches
            + DEFAULT_IM_END_TOKEN
            + DEFAULT_VI_START_TOKEN
            + DEFAULT_VIDEO_FRAME_TOKEN * num_frames
            + DEFAULT_VI_END_TOKEN)


def build_prompt(messages: Sequence[dict], num_patches: int = 256,
                 num_frames: int = DEFAULT_NUM_FRAMES,
                 require_media: bool = True) -> str:
    """openai-style messages -> '###'-separated Valley prompt.

    Accepts both 'assistant' and the reference's 'assistent' spelling
    (`valley_model.py:394`, SURVEY §7 quirk list).  ``require_media=False``
    permits text-only conversations (batch_infer's text rows; the
    reference's builder always demands a <video>, `valley_model.py:399`).
    """
    replace = media_replace_token(num_patches, num_frames)
    parts: List[str] = []
    for m in messages:
        role, content = m["role"], m["content"]
        if role == "system":
            parts.append(content + "\n\n" + "###")
        elif role in ("user", "human"):
            if "<video>" in content or "<image>" in content:
                content = content.replace("<video>", replace)
                content = content.replace("<image>", replace)
                parts.append(" Human: " + content + " \n###")
            else:
                parts.append(" Human: " + content + " \n###")
        elif role in ("assistant", "assistent"):
            parts.append(" Assistent: " + content + " \n###")
        else:
            raise ValueError(
                'Role must be "assistant", "user"/"human", or "system", '
                f"got {role!r}")
    prompt = "".join(parts)
    if require_media and DEFAULT_IM_START_TOKEN not in prompt:
        raise ValueError("You need to specify the <video> token in the query")
    return prompt


def process_response(outputs: Sequence[str]) -> List[str]:
    """Strip '###' separators and role prefixes from generations
    (`valley_model.py:404-422`)."""
    result = []
    for out in outputs:
        while True:
            cur_len = len(out)
            out = out.strip()
            for pattern in ["###", "Assistant:", "Response:", "Valley:",
                            "Assistent:"]:
                if out.startswith(pattern):
                    out = out[len(pattern):].strip()
            if len(out) == cur_len:
                break
        idx = out.find("###")
        if idx < 0:
            idx = len(out)
        result.append(out[:idx].strip())
    return result


def completion(engine: Engine, tokenizer, video: Optional[str],
               messages: Sequence[dict],
               gen: Optional[GenerationConfig] = None,
               frames: Optional[np.ndarray] = None,
               speculative: bool = False) -> List[str]:
    """One-shot video/image Q&A (`valley_model.py:424-439`).

    ``video`` is a path decoded via the data pipeline; alternatively pass
    preprocessed ``frames`` (T, 3, H, W) directly.  ``speculative``
    decodes via n-gram self-speculation (greedy token-identical,
    sampling distribution-exact).
    """
    cfg: ValleyConfig = engine.cfg
    num_frames = frames.shape[0] if frames is not None else DEFAULT_NUM_FRAMES
    prompt = build_prompt(messages, cfg.num_patches, num_frames)
    input_ids = tokenizer.encode(prompt)

    if frames is None:
        if video is None:
            raise ValueError("need a video path or preprocessed frames")
        from valley_tpu.data.video import load_video_tchw

        size = cfg.vision.image_size
        frames = load_video_tchw(video, fixed_frame_number=num_frames,
                                 crop_size=size,
                                 scale_size=max(size * 256 // 224, size))
    images = frames[None]  # (1, T, 3, H, W)

    gen = gen or GenerationConfig()
    if speculative:
        from valley_tpu.inference.speculative import SpecDecoder

        gen_iter = SpecDecoder(engine).generate(tokenizer, input_ids,
                                                images, gen)
    else:
        gen_iter = engine.generate(tokenizer, input_ids, images, gen)
    text = ""
    for text in gen_iter:
        pass
    return process_response([text])
