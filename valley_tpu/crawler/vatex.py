"""VATEX (YouTube) download tooling.

Parity with `Crawler/download_cmd_generation.py` +
`Crawler/parallel_download_VATEX.py`: cross-check the annotation file
against already-downloaded clips, emit yt-dlp commands for the missing
ones, and optionally execute them in a process pool.

  python -m valley_tpu.crawler.vatex gen  --video-path D --ann-file A.json
  python -m valley_tpu.crawler.vatex run  --cmd-file cmd_list.txt -j 8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
from multiprocessing import Pool
from typing import List


def crosscheck_videos(video_path: str, ann_file: str) -> List[str]:
    """Video IDs in the annotation file without an existing mp4.

    Filename conventions (reference `download_cmd_generation.py:8-31`):
    13-char basenames are `v_<11-char id>`, 11-char are bare ids."""
    existing = []
    for vid in glob.glob(os.path.join(video_path, "*.mp4")):
        base = os.path.basename(vid).split(".mp4")[0]
        if len(base) == 13:
            existing.append(base[2:])
        elif len(base) == 11:
            existing.append(base)
        else:
            raise RuntimeError(f"Unknown filename format: {vid}")
    with open(ann_file) as f:
        ann = json.load(f)
    if "VATEX" not in video_path:
        raise ValueError("Not VATEX form data, customize the code.")
    all_vids = sorted({"_".join(item["videoID"].split("_")[:-2])
                       for item in ann})
    return [v for v in all_vids if v not in set(existing)]


def build_commands(video_path: str, missing: List[str]) -> List[str]:
    out = []
    for vid in missing:
        filename = os.path.join(video_path, f"v_{vid}.mp4")
        cmd = ("yt-dlp --merge-output-format mp4 "
               f'"https://www.youtube.com/watch?v={vid}" -o "{filename}" '
               f'|| mv "{filename}.part" "{filename}"')
        out.append(cmd)
    return out


def _run_cmd(cmd: str) -> int:
    return subprocess.call(cmd, shell=True)


def run_parallel(commands: List[str], jobs: int = 8) -> None:
    """Process-pool execution (reference `parallel_download_VATEX.py`)."""
    with Pool(jobs) as pool:
        pool.map(_run_cmd, commands)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    gen = sub.add_parser("gen")
    gen.add_argument("--video-path", required=True)
    gen.add_argument("--ann-file", required=True)
    gen.add_argument("--out", default="cmd_list.txt")
    run = sub.add_parser("run")
    run.add_argument("--cmd-file", required=True)
    run.add_argument("-j", "--jobs", type=int, default=8)
    args = parser.parse_args()
    if args.cmd == "gen":
        missing = crosscheck_videos(args.video_path, args.ann_file)
        cmds = build_commands(args.video_path, missing)
        with open(args.out, "w") as f:
            f.write("\n".join(cmds) + "\n")
        print(f"{len(cmds)} commands written to {args.out}")
    else:
        with open(args.cmd_file) as f:
            cmds = [line.strip() for line in f if line.strip()]
        run_parallel(cmds, args.jobs)


if __name__ == "__main__":
    main()
