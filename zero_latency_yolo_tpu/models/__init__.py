from .yolov8 import (  # noqa: F401
    ModelSpec, VARIANTS, get_spec, init_params, apply_backbone,
    forward_raw, forward_decoded, fold_batchnorm, anchors_for,
)
from .weights import save_params, load_params, load_model  # noqa: F401
