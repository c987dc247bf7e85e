"""rotate_yolov3_tpu — a TPU-native rotated-object-detection framework.

A from-scratch JAX/flax/Pallas rebuild with the capabilities of the PyTorch
research repo ``ming71/rotate-yolov3`` (see SURVEY.md at the repo root for the
structural analysis of the reference and its evidence caveats; the reference
mount was empty at build time, so citations are to SURVEY.md sections rather
than reference file:line).

Design principles (TPU-first, not a port):
  * the whole image->detections path is one jitted XLA graph: backbone,
    rotated decode, score filtering and rotated NMS all run on device with
    **fixed shapes** (detections padded to MAX_DET with validity masks);
  * skew-IoU (rotated-rectangle intersection) is implemented as vectorised
    convex-polygon clipping with fixed <=8-vertex buffers — available as a
    pure-jnp differentiable op for the loss and as a Pallas TPU kernel for
    the NMS hot path;
  * data parallelism is `shard_map` + `psum` over a `jax.sharding.Mesh`
    (the TPU-native equivalent of the reference's optional
    ``nn.DataParallel``, SURVEY.md §2 "Parallelism strategies");
  * the public API mirrors the reference: Darknet ``.cfg``/``.data`` parsing,
    ``.weights`` binary checkpoints, ``train.py`` / ``detect.py`` / ``test.py``
    entry points.
"""

__version__ = "0.1.0"

from .detector import Detector, detections_to_numpy  # noqa: E402,F401
