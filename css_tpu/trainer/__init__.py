from css_tpu.trainer.lr_schedule import LRSchedule  # noqa: F401
from css_tpu.trainer.loop import (  # noqa: F401
    TrainState,
    Trainer,
    make_optimizer,
)
from css_tpu.trainer import checkpoint  # noqa: F401
