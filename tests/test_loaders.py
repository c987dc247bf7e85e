"""Inference loader tests: file/video iteration, batching, webcam guard."""

import os

import numpy as np
import pytest

from rotate_yolov3_tpu.data.loaders import (LoadImages, LoadWebcam, batched,
                                            list_sources)


@pytest.fixture()
def img_dir(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for i in range(5):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"),
                    rng.integers(0, 255, (80, 120, 3)).astype(np.uint8))
    (tmp_path / "notes.txt").write_text("ignored")
    return str(tmp_path)


def test_list_sources_filters_and_errors(img_dir, tmp_path):
    files = list_sources(img_dir)
    assert len(files) == 5
    assert all(f.endswith(".jpg") for f in files)
    with pytest.raises(FileNotFoundError):
        list_sources(str(tmp_path / "empty_nothing"))


def test_load_images_yields_letterboxed(img_dir):
    loader = LoadImages(img_dir, img_size=64)
    items = list(iter(loader))
    assert len(items) == len(loader) == 5
    path, boxed, img0, ratio, pad = items[0]
    assert boxed.shape == (64, 64, 3)
    assert img0.shape == (80, 120, 3)
    assert 0 < ratio <= 1


def test_load_images_video(img_dir, tmp_path):
    import cv2

    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (120, 80))
    rng = np.random.default_rng(1)
    for _ in range(4):
        w.write(rng.integers(0, 255, (80, 120, 3)).astype(np.uint8))
    w.release()
    items = list(iter(LoadImages(vid, img_size=64)))
    assert len(items) == 4
    assert items[2][0].endswith("#frame2")
    assert items[0][1].shape == (64, 64, 3)


def test_batched_pads_last():
    data = list(range(7))
    batches = list(batched(iter(data), 3))
    assert [(len(b), n) for b, n in batches] == [(3, 3), (3, 3), (3, 1)]
    assert batches[-1][0] == [6, 6, 6]   # padded by repeating the last


def test_webcam_bad_source():
    with pytest.raises(IOError):
        LoadWebcam("99", img_size=64)   # no camera hardware here


def test_load_images_net_input_is_rgb(tmp_path):
    """cv2 reads BGR; the net input must be RGB (reference-lineage channel
    order — .weights interop breaks silently otherwise)."""
    import cv2

    # solid red image: BGR on disk = (0, 0, 255)
    img = np.zeros((64, 64, 3), np.uint8)
    img[..., 2] = 255
    p = str(tmp_path / "red.png")
    cv2.imwrite(p, img)
    from rotate_yolov3_tpu.data.loaders import LoadImages

    path, boxed, img0, ratio, pad = next(iter(LoadImages(p, img_size=64)))
    assert boxed[32, 32, 0] == 255 and boxed[32, 32, 2] == 0   # RGB
    assert img0[32, 32, 2] == 255 and img0[32, 32, 0] == 0     # img0 stays BGR
