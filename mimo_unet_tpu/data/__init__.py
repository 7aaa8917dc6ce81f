from mimo_unet_tpu.data.core import (
    ArrayDataset,
    DataModule,
    iterate_batches,
    prefetch_to_device,
)

__all__ = ["ArrayDataset", "DataModule", "iterate_batches", "prefetch_to_device"]
