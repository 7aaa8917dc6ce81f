from mimo_unet_tpu.train.optim import adam_with_steplr, step_lr_schedule

__all__ = ["adam_with_steplr", "step_lr_schedule"]
