"""Interactive multi-turn video chat REPL (working equivalent of the
reference's broken `valley/inference/run_valley_conv.py` — see SURVEY §7:
missing SHELL_UI_HEADER, undefined conv.has_video).  Supports the
`change video <path>` command and frame-directory inputs.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

SHELL_UI_HEADER = r"""
 _    __      ____              __________  __  __
| |  / /___ _/ / /__  __  __   /_  __/ __ \/ / / /
| | / / __ `/ / / _ \/ / / /    / / / /_/ / / / /
| |/ / /_/ / / /  __/ /_/ /    / / / ____/ /_/ /
|___/\__,_/_/_/\___/\__, /    /_/ /_/    \____/
                   /____/   video assistant — type 'exit' to quit,
                            'change video <path>' to switch clips.
"""


def load_frames(engine, path: str, num_frames: int):
    from valley_tpu.data.video import load_video

    size = engine.cfg.vision.image_size
    clip = load_video(path, fixed_frame_number=num_frames, crop_size=size,
                      scale_size=max(size * 256 // 224, size))
    return np.transpose(clip, (1, 0, 2, 3))[None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-name", type=str, required=True)
    parser.add_argument("--video-file", type=str, required=True,
                        help="mp4 file or directory of frames")
    parser.add_argument("--vision-tower", type=str, default=None)
    parser.add_argument("--lora-path", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument("--num-frames", type=int, default=8)
    parser.add_argument("--conv-mode", type=str, default="v1")
    args = parser.parse_args()
    logging.basicConfig(level=logging.WARNING)

    from valley_tpu.conversation import conv_templates
    from valley_tpu.inference.engine import GenerationConfig
    from valley_tpu.inference.generate import media_replace_token
    from valley_tpu.inference.run_valley import load_model

    from valley_tpu.inference.engine import ChatSession

    engine, tokenizer = load_model(args.model_name, args.vision_tower,
                                   args.lora_path,
                                   max_new_tokens=args.max_new_tokens)
    print(SHELL_UI_HEADER)
    images = load_frames(engine, args.video_file, args.num_frames)
    conv = conv_templates[args.conv_mode].copy()
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           temperature=args.temperature,
                           do_sample=args.temperature >= 1e-4,
                           stop=(conv.sep,))
    session = ChatSession(engine, gen)   # multi-turn KV reuse
    eos = [getattr(tokenizer, "eos_token_id", 2) or 2]
    first_turn = True

    while True:
        try:
            inp = input(f"{conv.roles[0]}: ").strip()
        except EOFError:
            break
        if not inp or inp == "exit":
            break
        if inp.startswith("change video "):
            path = inp[len("change video "):].strip()
            try:
                images = load_frames(engine, path, args.num_frames)
            except Exception as e:
                print(f"failed to load {path}: {e}")
                continue
            conv = conv_templates[args.conv_mode].copy()
            session = ChatSession(engine, gen)
            first_turn = True
            print(f"switched to {path}; conversation reset.")
            continue

        if first_turn:
            inp = media_replace_token(engine.cfg.num_patches,
                                      images.shape[1]) + " " + inp
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        if first_turn:
            ids = tokenizer.encode(conv.get_prompt())
        else:
            ids = tokenizer.encode(
                f" {conv.roles[0]}: {inp}{conv.sep}{conv.roles[1]}:")
            if ids and ids[0] == getattr(tokenizer, "bos_token_id", 1):
                ids = ids[1:]
        print(f"{conv.roles[1]}: ", end="", flush=True)
        reply = session.chat(ids, images=images if first_turn else None,
                             tokenizer=tokenizer, eos_ids=eos)
        text = tokenizer.decode(reply, skip_special_tokens=True)
        idx = text.find(conv.sep)
        if idx >= 0:
            text = text[:idx]
        print(text)
        conv.messages[-1][-1] = text
        first_turn = False


if __name__ == "__main__":
    main()
