from .darknet import (NetworkSpec, YoloSpec, apply_fused, apply_network,
                      build_network, count_params, fuse_bn, init_params)
from .packed_stem import can_pack_stem, pack_stem
from .weights_io import (load_darknet_weights, load_torch_pt,
                         load_weights_file, save_darknet_weights,
                         save_torch_pt)
from .yolo_head import (ANGLE_RANGE, decode_all, decode_head, head_anchors,
                        num_predictions, reshape_head)

__all__ = [
    "NetworkSpec", "YoloSpec", "apply_fused", "apply_network",
    "build_network", "can_pack_stem", "count_params", "fuse_bn",
    "init_params", "pack_stem",
    "load_darknet_weights", "load_torch_pt", "load_weights_file",
    "save_darknet_weights", "save_torch_pt",
    "ANGLE_RANGE", "decode_all", "decode_head", "head_anchors",
    "num_predictions", "reshape_head",
]
