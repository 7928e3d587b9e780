"""LLaMA-2 Valley one-shot inference (parity with
`valley/inference/run_valley_llamma_v2.py`, which pins `Valley2-7b` and
sampling on).  Thin wrapper over run_valley with do_sample defaulted."""

from __future__ import annotations

import sys


def main():
    argv = sys.argv[1:]
    if "--do-sample" not in argv:
        argv.append("--do-sample")
    sys.argv = [sys.argv[0]] + argv

    from valley_tpu.inference.run_valley import main as run

    run()


if __name__ == "__main__":
    main()
