from mimo_unet_tpu.eval.fgsm import fgsm_attack
from mimo_unet_tpu.eval.artifacts import (
    make_predictions,
    make_predictions_evidential,
    convert_to_dataframe,
    create_precision_recall,
    create_calibration,
    write_artifacts,
)

__all__ = [
    "fgsm_attack",
    "make_predictions",
    "make_predictions_evidential",
    "convert_to_dataframe",
    "create_precision_recall",
    "create_calibration",
    "write_artifacts",
]
