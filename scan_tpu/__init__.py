"""scan_tpu: a TPU-native (JAX/XLA/Pallas) cross-domain object detection
framework with the capabilities of CityU-AIM-Group/SCAN (AAAI-22).

Subpackages:
  config      yacs-compatible configuration (loads the reference YAMLs)
  structures  fixed-capacity padded box/image containers
  ops         detection math + Pallas TPU kernels (NMS, focal loss, ...)
  modeling    flax.linen models: backbones, FCOS, condgraph, discriminators
  solver      optax optimizers with per-module LR schedules
  data        datasets, transforms, bucketed batching
  evaluation  COCO/VOC mAP evaluation (self-contained, no pycocotools)
  engine      jitted train/eval loops
  parallel    device-mesh / sharding helpers
  utils       checkpointing, logging, metrics
"""

__version__ = "0.1.0"
