"""JukinMedia dataset tooling.

Parity with `Crawler/download_jukin_video_id.py` (Algolia index pagination
into a per-category id manifest) and `Crawler/parallel_download_jukin.py`
(bounded thread-pool downloader with resume: already-downloaded ids are
skipped).  The reference's hand-rolled callback ThreadPool is replaced by
a `ThreadPoolExecutor` with a bounded submission loop — identical
behavior, no unbounded task queue.

  python -m valley_tpu.crawler.jukin ids      --save-folder ./jukinmedia
  python -m valley_tpu.crawler.jukin download --save-dir D --input-file M.json
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List

ALGOLIA_HEADERS = {
    "X-Algolia-Api-Key": "a6099f9d3771d6ceb142321ac5273d16",
    "X-Algolia-Application-Id": "XSWHBQ6C6E",
    "User-Agent": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                   "AppleWebKit/537.36 (KHTML, like Gecko) "
                   "Chrome/114.0.0.0 Safari/537.36"),
}
ALGOLIA_URL = "https://xswhbq6c6e-2.algolianet.com/1/indexes/public_lp/query"
DOWNLOAD_URL = "https://www.jukinmedia.com/api/public/video/downloadVideo/"

# category -> approximate item count (reference
# `download_jukin_video_id.py:12-17`)
CATEGORY_NUMBER = {
    "Fails": 10000, "Pets": 10000, "Awesome": 9507, "Wildlife": 8896,
    "Humor": 6493, "Talent": 5471, "DIY": 2569, "Uplifting": 2431,
    "Newsworthy": 1957, "Cute": 1952, "Parenting": 1880, "Weather": 1630,
    "Fitness": 1385, "Family": 1296, "Art": 1154, "Food": 1116,
    "Crashes": 980, "Sports": 947, "Vehicles": 439, "Lifestyle": 370,
    "Nature": 330, "Travel": 294, "Crime": 161, "Paranormal": 115,
    "RecordSetter": 3, "Nitro Circus": 1,
}


def fetch_ids(save_folder: str) -> Dict[str, List[dict]]:
    import requests

    result: Dict[str, List[dict]] = {}
    for category, count in CATEGORY_NUMBER.items():
        pages = math.ceil(count / 1000)
        hits: List[dict] = []
        for page in range(pages):
            payload = {"query": "", "userToken": "guest",
                       "hitsPerPage": 1000, "page": page,
                       "facets": ["category"],
                       "facetFilters": [["category:" + category]]}
            resp = requests.post(ALGOLIA_URL, headers=ALGOLIA_HEADERS,
                                 json=payload, timeout=30)
            hits += resp.json()["hits"]
        result[category] = hits
    Path(save_folder).mkdir(parents=True, exist_ok=True)
    out = Path(save_folder) / "jukin-100k.json"
    json.dump(result, open(out, "w"))
    print(f"wrote manifest with {sum(len(v) for v in result.values())} "
          f"entries to {out}")
    return result


def download_one(save_dir: Path, jm_id: str) -> str:
    import requests

    resp = requests.post(DOWNLOAD_URL + str(jm_id),
                         headers=ALGOLIA_HEADERS, timeout=30)
    url = resp.json()["url"]
    video = requests.get(url, timeout=120)
    path = save_dir / f"v_{jm_id}.mp4"
    path.write_bytes(video.content)
    return str(jm_id)


def check_already(save_dir: str,
                  ids: List[str]) -> List[str]:
    done = {p.name.split(".")[0].split("_", 1)[1]
            for p in Path(save_dir).rglob("*.mp4")}
    left = [i for i in ids if str(i) not in done]
    print(f"already {len(done)}, left {len(left)}")
    return left


def download_all(save_dir: str, input_file: str, jobs: int = 5) -> None:
    manifest = json.load(open(input_file))
    ids = [item["jmId"] for cat in manifest for item in manifest[cat]]
    ids = check_already(save_dir, ids)
    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    done = 0
    with ThreadPoolExecutor(max_workers=jobs) as pool:
        futures = {pool.submit(download_one, out_dir, i): i for i in ids}
        for fut in as_completed(futures):
            done += 1
            jm_id = futures[fut]
            try:
                fut.result()
                status = "ok"
            except Exception as e:
                status = f"failed: {e}"
            pct = math.ceil(done / max(len(ids), 1) * 100)
            sys.stdout.write(f"\r[{pct:3d}%] [{done}/{len(ids)}] "
                             f"{jm_id} {status}   ")
            sys.stdout.flush()
    print("\ndone")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    ids = sub.add_parser("ids")
    ids.add_argument("--save-folder", default="./jukinmedia")
    dl = sub.add_parser("download")
    dl.add_argument("--save-dir", required=True)
    dl.add_argument("--input-file", default="./jukinmedia/jukin-100k.json")
    dl.add_argument("--num-process", type=int, default=5)
    args = parser.parse_args()
    if args.cmd == "ids":
        fetch_ids(args.save_folder)
    else:
        download_all(args.save_dir, args.input_file, args.num_process)


if __name__ == "__main__":
    main()
