"""Native C++ video decode/preprocess extension: build, parity vs the
python (cv2) pipeline, and integration through load_video."""

import os

import numpy as np
import pytest

native = pytest.importorskip("valley_tpu.native")

try:
    native._load()
    HAVE_SO = True
except ImportError:
    HAVE_SO = False

pytestmark = pytest.mark.skipif(not HAVE_SO,
                                reason="native extension not buildable")


@pytest.fixture(scope="module")
def gradient_video(tmp_path_factory):
    """A video with real spatial content (gradients), not flat frames."""
    import cv2

    path = str(tmp_path_factory.mktemp("nvid") / "grad.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12,
                        (160, 120))
    yy, xx = np.mgrid[0:120, 0:160]
    for i in range(36):
        frame = np.stack([(xx + 2 * i) % 256, (yy + 3 * i) % 256,
                          ((xx + yy) // 2 + i) % 256],
                         axis=-1).astype(np.uint8)
        w.write(frame)
    w.release()
    return path


def test_video_info(gradient_video):
    n, fps = native.video_info(gradient_video)
    assert n == 36
    assert abs(fps - 12.0) < 0.5


def test_native_matches_python_pipeline(gradient_video):
    out = native.decode_preprocess(gradient_video, num_frames=6,
                                   scale_size=96, crop_size=80)
    assert out.shape == (3, 6, 80, 80)

    os.environ["VALLEY_DISABLE_NATIVE"] = "1"
    try:
        from valley_tpu.data.video import load_video

        ref = load_video(gradient_video, fixed_frame_number=6,
                         crop_size=80, scale_size=96)
    finally:
        del os.environ["VALLEY_DISABLE_NATIVE"]
    # bilinear implementations differ slightly (swscale vs cv2); the
    # normalized features must still agree closely
    diff = np.abs(out - ref)
    assert diff.mean() < 0.05, diff.mean()
    assert np.median(diff) < 0.02


def test_load_video_uses_native(gradient_video, monkeypatch):
    calls = {}
    real = native.decode_preprocess

    def spy(*a, **k):
        calls["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(native, "decode_preprocess", spy)
    from valley_tpu.data.video import load_video

    out = load_video(gradient_video, fixed_frame_number=4)
    assert calls.get("hit")
    assert out.shape == (3, 4, 224, 224)


def test_native_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_preprocess("/tmp/does_not_exist_931.mp4")


def test_native_single_frame(gradient_video):
    out = native.decode_preprocess(gradient_video, num_frames=1,
                                   scale_size=96, crop_size=80)
    assert out.shape == (3, 1, 80, 80)
