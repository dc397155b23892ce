from .dacs import DACSTrainer, DACSTrainState
from .transforms import multi_stream_loss, downscale_label_ratio

__all__ = ["DACSTrainer", "DACSTrainState", "multi_stream_loss",
           "downscale_label_ratio"]
