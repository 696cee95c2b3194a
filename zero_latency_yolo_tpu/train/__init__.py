from .loss import detection_loss, distill_loss  # noqa: F401
from .step import TrainState, make_train_step, init_train_state  # noqa: F401
