"""Logging / observability utilities.

Parity with `valley/utils.py`: `build_logger` attaches a daily-rotating
file handler and redirects stdout/stderr (`utils.py:70-110`);
`print_trainable_params` summarizes the trainable tree (`utils.py:22-44`);
`rank_zero_info` logs only on process 0 (`utils.py:46`).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Any, Optional

import jax
import numpy as np

handler = None

server_error_msg = ("**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE REGENERATE "
                    "OR REFRESH THIS PAGE.**")
moderation_msg = ("YOUR INPUT VIOLATES OUR CONTENT MODERATION GUIDELINES. "
                  "PLEASE TRY AGAIN.")


class StreamToLogger:
    """File-like that redirects writes into a logger (`utils.py:113-143`)."""

    def __init__(self, logger: logging.Logger, log_level=logging.INFO):
        self.terminal = sys.stdout
        self.logger = logger
        self.log_level = log_level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(self.terminal, attr)

    def write(self, buf):
        temp_linebuf = self.linebuf + buf
        self.linebuf = ""
        for line in temp_linebuf.splitlines(True):
            if line[-1] == "\n":
                self.logger.log(self.log_level, line.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf != "":
            self.logger.log(self.log_level, self.linebuf.rstrip())
        self.linebuf = ""


def build_logger(logger_name: str, logger_filename: str,
                 log_dir: str = ".") -> logging.Logger:
    global handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")

    if not logging.getLogger().handlers:
        logging.basicConfig(level=logging.INFO)
    logging.getLogger().handlers[0].setFormatter(formatter)

    stdout_logger = logging.getLogger("stdout")
    stdout_logger.setLevel(logging.INFO)
    sys.stdout = StreamToLogger(stdout_logger, logging.INFO)
    stderr_logger = logging.getLogger("stderr")
    stderr_logger.setLevel(logging.ERROR)
    sys.stderr = StreamToLogger(stderr_logger, logging.ERROR)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if handler is None:
        os.makedirs(log_dir, exist_ok=True)
        filename = os.path.join(log_dir, logger_filename)
        handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True)
        handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(handler)
    return logger


def get_logger(name: str, filename: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if filename:
        fh = logging.FileHandler(filename)
        fh.setFormatter(logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s"))
        logger.addHandler(fh)
    return logger


def rank_zero_info(message: str, logger=None) -> None:
    if jax.process_index() == 0:
        (logger or logging.getLogger(__name__)).info(message)


def print_trainable_params(params: Any, labels: Any = None) -> str:
    """Tabulate per-subtree parameter counts; with optax labels, split
    trainable vs frozen (`utils.py:22-44` PrettyTable parity)."""
    rows = []
    total = 0
    trainable = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    label_flat = jax.tree_util.tree_flatten_with_path(labels)[0] \
        if labels is not None else None
    for i, (path, leaf) in enumerate(flat):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        lab = label_flat[i][1] if label_flat else "base"
        if lab != "frozen":
            trainable += n
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path)
        rows.append((name, n, lab))
    lines = [f"{'param':60s} {'count':>14s} {'group':>8s}"]
    for name, n, lab in rows:
        lines.append(f"{name:60s} {n:14,d} {lab:>8s}")
    lines.append(f"total={total:,} trainable={trainable:,} "
                 f"({100.0 * trainable / max(total, 1):.2f}%)")
    table = "\n".join(lines)
    if jax.process_index() == 0:
        print(table)
    return table


def violates_moderation(text: str) -> bool:
    """OpenAI moderation check (`valley/utils.py:155-173` parity): flags
    disallowed user input in the serve path.  Fails open (False) when no
    API key is configured or the request errors."""
    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    try:
        import requests

        url = "https://api.openai.com/v1/moderations"
        headers = {"Content-Type": "application/json",
                   "Authorization": "Bearer " + api_key}
        text = text.replace("\n", "")
        ret = requests.post(url, headers=headers,
                            json={"input": text}, timeout=5)
        return bool(ret.json()["results"][0]["flagged"])
    except Exception:
        return False


def pretty_print_semaphore(semaphore) -> str:
    """(`valley/utils.py:176` parity; handles asyncio + threading sems)"""
    if semaphore is None:
        return "None"
    locked = semaphore.locked() if hasattr(semaphore, "locked") \
        else semaphore._value == 0
    return f"Semaphore(value={semaphore._value}, locked={locked})"


def disable_progress():
    os.environ["TQDM_DISABLE"] = "1"
