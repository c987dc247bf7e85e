"""detect.py CLI surface: video in -> annotated video out (SURVEY.md §2
"detect CLI" draw/write role)."""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def test_detect_cli_writes_annotated_video(tmp_path):
    import cv2

    clip = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 12.0,
                        (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()

    from detect import detect, make_parser

    out_dir = str(tmp_path / "out")
    opt = make_parser().parse_args([
        "--cfg", os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg"),
        "--source", clip, "--output", out_dir, "--img-size", "96",
        "--conf-thres", "0.2", "--batch-size", "2"])
    detect(opt)

    vout = os.path.join(out_dir, "clip_det.mp4")
    assert os.path.exists(vout)
    cap = cv2.VideoCapture(vout)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 6
    assert cap.get(cv2.CAP_PROP_FPS) == 12.0
    cap.release()
    # per-frame txt detections written alongside
    assert os.path.exists(os.path.join(out_dir, "clip_frame0.txt"))
