"""Golden tests for the Darknet .cfg / .data parsers (SURVEY.md §4 unit plan)."""

import os

import pytest

from rotate_yolov3_tpu.config.parse import (
    load_classes, parse_data_cfg, parse_model_cfg)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_tiny_cfg_structure():
    defs = parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg"))
    assert defs[0]["type"] == "net"
    assert defs[0]["width"] == 416 and defs[0]["height"] == 416
    types = [d["type"] for d in defs[1:]]
    assert types.count("yolo") == 1
    assert "shortcut" in types and "route" in types and "upsample" in types
    yolo = [d for d in defs if d["type"] == "yolo"][0]
    assert yolo["mask"] == [3, 4]
    assert len(yolo["anchors"]) == 18  # 9 (w,h) pairs
    assert yolo["angles"] == [-60.0, -30.0, 0.0, 30.0, 60.0, 90.0]
    assert yolo["classes"] == 1
    assert yolo["ignore_thresh"] == 0.5


def test_parse_full_cfg_filter_arithmetic():
    defs = parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-hrsc.cfg"))
    yolos = [i for i, d in enumerate(defs) if d["type"] == "yolo"]
    assert len(yolos) == 3
    for yi in yolos:
        yolo = defs[yi]
        pred_conv = defs[yi - 1]
        na = len(yolo["mask"]) * len(yolo["angles"])
        expected = na * (6 + yolo["classes"])  # x,y,w,h,theta,obj + classes
        assert pred_conv["type"] == "convolutional"
        assert pred_conv["filters"] == expected
        assert pred_conv["batch_normalize"] == 0
        assert pred_conv["activation"] == "linear"


def test_parse_full_cfg_darknet53_shape():
    defs = parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-dota.cfg"))
    layers = defs[1:]
    # Darknet-53 has 23 residual adds; yolov3 topology has 2 upsamples,
    # 4 routes, 75 conv layers in the backbone + 3x7 head convs
    assert sum(d["type"] == "shortcut" for d in layers) == 23
    assert sum(d["type"] == "upsample" for d in layers) == 2
    assert sum(d["type"] == "route" for d in layers) == 4
    assert sum(d["type"] == "convolutional" for d in layers) == 75


def test_convert_value_types():
    defs = parse_model_cfg(os.path.join(ROOT, "cfg/yolov3-rotate-tiny.cfg"))
    net = defs[0]
    assert isinstance(net["batch"], int)
    assert isinstance(net["momentum"], float)
    assert isinstance(net["policy"], str)
    assert net["steps"] == [400000.0, 450000.0]


def test_parse_data_cfg_and_names():
    opts = parse_data_cfg(os.path.join(ROOT, "datacfg/hrsc2016.data"))
    assert opts["classes"] == 1
    names = load_classes(os.path.join(ROOT, opts["names"]))
    assert names == ["ship"]
    dota = parse_data_cfg(os.path.join(ROOT, "datacfg/dota.data"))
    assert dota["classes"] == 15
    dota_names = load_classes(os.path.join(ROOT, dota["names"]))
    assert len(dota_names) == 15 and dota_names[0] == "plane"


def test_parser_errors(tmp_path):
    bad = tmp_path / "bad.cfg"
    bad.write_text("[convolutional]\nfilters=3\n")
    with pytest.raises(ValueError):
        parse_model_cfg(str(bad))
    with pytest.raises(FileNotFoundError):
        parse_model_cfg(str(tmp_path / "missing.cfg"))
    with pytest.raises(ValueError):
        parse_model_cfg(str(tmp_path / "not_cfg.txt"))
