from mimo_unet_tpu.models.mimo_unet import (
    MimoUNetConfig,
    mimo_unet_init,
    mimo_unet_apply,
    count_parameters,
)

__all__ = [
    "MimoUNetConfig",
    "mimo_unet_init",
    "mimo_unet_apply",
    "count_parameters",
]
