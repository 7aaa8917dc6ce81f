from mimo_unet_tpu.tasks.mimo import MimoUnetTask, TrainState
from mimo_unet_tpu.tasks.evidential import EvidentialUnetTask

__all__ = ["MimoUnetTask", "EvidentialUnetTask", "TrainState"]
