#!/usr/bin/env python
"""Generate the Darknet .cfg assets for rotate_yolov3_tpu.

The reference ships hand-written Darknet-53 + 3-scale rotated-YOLO cfg files
(SURVEY.md §2 "cfg assets"). We generate ours so the architecture arithmetic
(filter counts = len(mask)*len(angles)*(6+nc)) is provably consistent; the
generated files are committed as plain-text assets exactly like the
reference's.

Usage: python tools/make_cfg.py   (writes into cfg/)
"""

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# COCO-lineage yolov3 anchors (w,h in pixels at 608 net scale).
ANCHORS = "10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326"
# Rotation extension: each (w,h) anchor replicated at these angle offsets (deg).
ANGLES = "-60,-30,0,30,60,90"
N_ANGLES = 6


def conv(filters, size, stride=1, bn=1, activation="leaky"):
    pad = 1 if size > 1 else 0  # darknet 'pad=1' means same-padding
    lines = ["[convolutional]"]
    if bn:
        lines.append("batch_normalize=1")
    lines += [f"filters={filters}", f"size={size}", f"stride={stride}",
              f"pad={pad}", f"activation={activation}", ""]
    return lines


def shortcut(frm=-3):
    return ["[shortcut]", f"from={frm}", "activation=linear", ""]


def route(layers):
    return ["[route]", "layers=" + ",".join(str(x) for x in layers), ""]


def upsample(stride=2):
    return ["[upsample]", f"stride={stride}", ""]


def yolo(mask, classes, ignore_thresh=0.5, anchors=None, num=9):
    return [
        "[yolo]",
        f"mask = {','.join(str(m) for m in mask)}",
        f"anchors = {anchors or ANCHORS}",
        f"angles = {ANGLES}",
        f"classes={classes}",
        f"num={num}",
        "jitter=.3",
        f"ignore_thresh = {ignore_thresh}",
        "truth_thresh = 1",
        "random=0",
        "",
    ]


def net_block(width, height, batch=8):
    return [
        "[net]",
        f"batch={batch}",
        "subdivisions=1",
        f"width={width}",
        f"height={height}",
        "channels=3",
        "momentum=0.9",
        "decay=0.0005",
        "angle=0",
        "saturation = 1.5",
        "exposure = 1.5",
        "hue=.1",
        "",
        "learning_rate=0.001",
        "burn_in=1000",
        "max_batches = 500200",
        "policy=steps",
        "steps=400000,450000",
        "scales=.1,.1",
        "",
    ]


def residual_stage(out_filters, n_blocks):
    """Darknet-53 stage: stride-2 downsample conv then n residual blocks."""
    lines = conv(out_filters, 3, stride=2)
    lines += ["# residual blocks", ""]
    for _ in range(n_blocks):
        lines += conv(out_filters // 2, 1)
        lines += conv(out_filters, 3)
        lines += shortcut(-3)
    return lines


def head_filters(n_mask, classes):
    # rotated box: x,y,w,h,theta (5) + objectness (1) + classes
    return n_mask * N_ANGLES * (6 + classes)


def full_cfg(classes, width=608, height=608):
    """Darknet-53 backbone + 3-scale rotated YOLO heads (yolov3 topology)."""
    L = net_block(width, height)
    # --- Darknet-53 backbone ---
    L += conv(32, 3)                      # layer 0
    L += residual_stage(64, 1)            # layers 1-4
    L += residual_stage(128, 2)           # 5-11
    L += residual_stage(256, 8)           # 12-36  (route point: 36)
    L += residual_stage(512, 8)           # 37-61  (route point: 61)
    L += residual_stage(1024, 4)          # 62-74
    # --- head 1 (stride 32) ---
    L += conv(512, 1)                     # 75
    L += conv(1024, 3)                    # 76
    L += conv(512, 1)                     # 77
    L += conv(1024, 3)                    # 78
    L += conv(512, 1)                     # 79
    L += conv(1024, 3)                    # 80
    L += conv(head_filters(3, classes), 1, bn=0, activation="linear")  # 81
    L += yolo([6, 7, 8], classes)         # 82
    # --- head 2 (stride 16) ---
    L += route([-4])                      # 83 (from 79)
    L += conv(256, 1)                     # 84
    L += upsample(2)                      # 85
    L += route([-1, 61])                  # 86
    L += conv(256, 1)                     # 87
    L += conv(512, 3)                     # 88
    L += conv(256, 1)                     # 89
    L += conv(512, 3)                     # 90
    L += conv(256, 1)                     # 91
    L += conv(512, 3)                     # 92
    L += conv(head_filters(3, classes), 1, bn=0, activation="linear")  # 93
    L += yolo([3, 4, 5], classes)         # 94
    # --- head 3 (stride 8) ---
    L += route([-4])                      # 95 (from 91)
    L += conv(128, 1)                     # 96
    L += upsample(2)                      # 97
    L += route([-1, 36])                  # 98
    L += conv(128, 1)                     # 99
    L += conv(256, 3)                     # 100
    L += conv(128, 1)                     # 101
    L += conv(256, 3)                     # 102
    L += conv(128, 1)                     # 103
    L += conv(256, 3)                     # 104
    L += conv(head_filters(3, classes), 1, bn=0, activation="linear")  # 105
    L += yolo([0, 1, 2], classes)         # 106
    return "\n".join(L) + "\n"


def tiny_cfg(classes=1, width=416, height=416):
    """A minimal backbone + single rotated head for fast CPU tests
    (BASELINE.json config #1: tiny-backbone 416x416 on CPU).
    Exercises every block type: conv/bn, shortcut, route, upsample, maxpool,
    yolo."""
    L = net_block(width, height, batch=2)
    L += conv(8, 3)                       # 0
    L += conv(16, 3, stride=2)            # 1
    L += conv(8, 1)                       # 2
    L += conv(16, 3)                      # 3
    L += shortcut(-3)                     # 4
    L += conv(32, 3, stride=2)            # 5
    L += ["[maxpool]", "size=2", "stride=2", ""]  # 6
    L += conv(64, 3, stride=2)            # 7
    L += conv(32, 1)                      # 8
    L += upsample(2)                      # 9
    L += route([-1, 6])                   # 10  (32 + 32 ch)
    L += conv(32, 3)                      # 11
    L += conv(head_filters(2, classes), 1, bn=0, activation="linear")  # 12
    # tiny: use 2 anchor masks
    y = yolo([3, 4], classes)
    L += y                                # 13
    return "\n".join(L) + "\n"


def maxpool(size=2, stride=2):
    return ["[maxpool]", f"size={size}", f"stride={stride}", ""]


def yolov3_tiny_cfg(classes=1, width=608, height=608):
    """The real yolov3-tiny topology (darknet lineage) with rotated heads.

    Two-scale detector: maxpool-downsampled backbone (incl. the stride-1
    size-2 maxpool before the 1024 conv), heads at strides 32 and 16 with
    masks [3,4,5] / [0,1,2] over a 6-anchor table — the lineage's second
    model family, useful where Darknet-53 is overkill."""
    # yolov3-tiny's published 6-anchor table (416-scale), angle-replicated
    tiny_anchors = "10,14, 23,27, 37,58, 81,82, 135,169, 344,319"
    L = net_block(width, height)
    L += conv(16, 3)                   # 0
    L += maxpool()                     # 1
    L += conv(32, 3)                   # 2
    L += maxpool()                     # 3
    L += conv(64, 3)                   # 4
    L += maxpool()                     # 5
    L += conv(128, 3)                  # 6
    L += maxpool()                     # 7
    L += conv(256, 3)                  # 8  (route point)
    L += maxpool()                     # 9
    L += conv(512, 3)                  # 10
    L += maxpool(2, 1)                 # 11 (stride-1 pool, SAME pad)
    L += conv(1024, 3)                 # 12
    L += conv(256, 1)                  # 13 (route point)
    L += conv(512, 3)                  # 14
    L += conv(head_filters(3, classes), 1, bn=0, activation="linear")  # 15
    L += yolo([3, 4, 5], classes, anchors=tiny_anchors, num=6)  # 16, s32
    L += route([-4])                   # 17 -> conv256 @13
    L += conv(128, 1)                  # 18
    L += upsample(2)                   # 19
    L += route([-1, 8])                # 20
    L += conv(256, 3)                  # 21
    L += conv(head_filters(3, classes), 1, bn=0, activation="linear")  # 22
    L += yolo([0, 1, 2], classes, anchors=tiny_anchors, num=6)  # 23, s16
    return "\n".join(L) + "\n"


def main():
    cfgdir = os.path.join(ROOT, "cfg")
    os.makedirs(cfgdir, exist_ok=True)
    with open(os.path.join(cfgdir, "yolov3-rotate-hrsc.cfg"), "w") as f:
        f.write(full_cfg(classes=1))
    with open(os.path.join(cfgdir, "yolov3-rotate-dota.cfg"), "w") as f:
        f.write(full_cfg(classes=15))
    with open(os.path.join(cfgdir, "yolov3-rotate-tiny.cfg"), "w") as f:
        f.write(tiny_cfg(classes=1, width=416, height=416))
    with open(os.path.join(cfgdir, "yolov3-tiny-rotate-hrsc.cfg"), "w") as f:
        f.write(yolov3_tiny_cfg(classes=1))
    print("wrote cfg assets to", cfgdir)


if __name__ == "__main__":
    main()
