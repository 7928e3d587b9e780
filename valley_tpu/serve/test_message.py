"""Smoke-test client: send one prompt through controller -> worker and
print the stream (the reference's `test_message.py` is broken — imports
`llava` — this is the working equivalent)."""

import argparse
import json

import requests

from valley_tpu.conversation import default_conversation


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller-address", type=str,
                        default="http://localhost:21001")
    parser.add_argument("--worker-address", type=str, default=None)
    parser.add_argument("--model-name", type=str, default="valley")
    parser.add_argument("--max-new-tokens", type=int, default=32)
    parser.add_argument("--message", type=str,
                        default="Tell me a story with more than 1000 words.")
    args = parser.parse_args()

    if args.worker_address:
        worker_addr = args.worker_address
    else:
        requests.post(args.controller_address + "/refresh_all_workers")
        models = requests.post(args.controller_address + "/list_models"
                               ).json()["models"]
        print(f"Models: {models}")
        worker_addr = requests.post(
            args.controller_address + "/get_worker_address",
            json={"model": args.model_name}).json()["address"]
        print(f"worker_addr: {worker_addr}")
    if worker_addr == "":
        print("No available workers")
        return

    conv = default_conversation.copy()
    conv.append_message(conv.roles[0], args.message)
    prompt = conv.get_prompt()

    response = requests.post(
        worker_addr + "/worker_generate_stream",
        json={"model": args.model_name, "prompt": prompt,
              "max_new_tokens": args.max_new_tokens, "temperature": 0.7,
              "stop": conv.sep},
        stream=True)
    for chunk in response.iter_lines(decode_unicode=False, delimiter=b"\0"):
        if chunk:
            data = json.loads(chunk.decode())
            print(data["text"].split(conv.sep)[-1], end="\r")
    print("")


if __name__ == "__main__":
    main()
