from .preprocess import letterbox_batch, letterbox_params, stretch_batch  # noqa: F401
from .nms import postprocess_batch, nms_reference  # noqa: F401
