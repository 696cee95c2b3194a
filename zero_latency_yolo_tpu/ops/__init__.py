from .preprocess import (  # noqa: F401
    letterbox_batch, letterbox_batch_mxu, letterbox_params, stretch_batch,
)
from .nms import postprocess_batch, nms_reference  # noqa: F401
