"""Conversation media helpers used by the serve layer: image aspect
resizing/b64 export, video b64 export, gradio-format conversion."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from valley_tpu.conversation import (Conversation, SeparatorStyle,
                                     _aspect_resize, _expand2square)


def _conv_with_image(img, mode="Crop"):
    conv = Conversation(system="S", roles=("Human", "Assistant"),
                        messages=[], offset=0)
    conv.append_message("Human", ("look", img, mode))
    conv.append_message("Assistant", "ok")
    return conv


def test_expand2square():
    img = Image.new("RGB", (100, 40), (10, 20, 30))
    sq = _expand2square(img)
    assert sq.size == (100, 100)
    assert _expand2square(Image.new("RGB", (50, 50))).size == (50, 50)
    tall = _expand2square(Image.new("RGB", (30, 90)))
    assert tall.size == (90, 90)


def test_aspect_resize_bounds():
    img = Image.new("RGB", (1600, 800))
    out = _aspect_resize(img)
    # shortest edge min(800/2, 400, 800) = 400, longest 800
    assert out.size == (800, 400)
    small = _aspect_resize(Image.new("RGB", (100, 60)))
    assert small.size == (100, 60)  # already under the bounds


def test_get_images_b64_and_pil():
    img = Image.new("RGB", (640, 480), (200, 30, 40))
    conv = _conv_with_image(img, mode="Pad")
    b64s = conv.get_images()
    assert len(b64s) == 1 and isinstance(b64s[0], str)
    pils = conv.get_images(return_pil=True)
    assert pils[0].size[0] == pils[0].size[1]  # padded square

    with pytest.raises(ValueError):
        _conv_with_image(img, mode="Bogus").get_images()


def test_get_video_b64(tmp_path):
    p = tmp_path / "v.mp4"
    p.write_bytes(b"FAKEVIDEOBYTES")
    conv = Conversation(system="S", roles=("Human", "Assistant"),
                        messages=[], offset=0)
    conv.append_message("Human", ("watch", str(p), "Crop"))
    conv.append_message("Assistant", None)
    videos, paths = conv.get_video()
    assert paths == [str(p)]
    import base64

    assert base64.b64decode(videos[0]) == b"FAKEVIDEOBYTES"


def test_to_gradio_chatbot_roundtrip():
    img = Image.new("RGB", (320, 240), (1, 2, 3))
    conv = _conv_with_image(img)
    rows = conv.to_gradio_chatbot()
    assert len(rows) == 1
    assert "data:image/png;base64," in rows[0][0]
    assert rows[0][1] == "ok"


def test_video_to_gradio_chatbot(tmp_path):
    p = tmp_path / "v.mp4"
    p.write_bytes(b"VID")
    conv = Conversation(system="S", roles=("Human", "Assistant"),
                        messages=[], offset=0)
    conv.append_message("Human", ("see <video>", str(p), "Crop"))
    conv.append_message("Assistant", "sure")
    rows = conv.video_to_gradio_chatbot()
    assert "<video controls" in rows[0][0]
    assert "<video>" not in rows[0][0].split("<video controls")[0]
