"""Round-5 verification: PartialDeviceDataset capacity fallback driven
end-to-end on the real chip — a budget of half the split must pin a
subset, stream the rest, and train with a decreasing loss."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    print("devices:", jax.devices())
    from make_fixtures import make_nyuv2_h5
    from mimo_unet_tpu.data.core import dataset_nbytes
    from mimo_unet_tpu.data.nyuv2 import NYUv2DepthDataModule
    from mimo_unet_tpu.tasks import MimoUnetTask
    from mimo_unet_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp()
    data_dir = make_nyuv2_h5(os.path.join(tmp, "data"), n=32, h=64, w=128)
    dm = NYUv2DepthDataModule(dataset_dir=data_dir, batch_size=8, seed=0,
                              host_dtype="uint8")
    dm.setup()
    budget = dataset_nbytes(dm.train_dataset()) // 2
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=6, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    trainer = Trainer(
        task, dm, max_epochs=3,
        checkpoint_path=os.path.join(tmp, "ckpt"),
        log_every_n_steps=0, log_images=False, num_devices=1, seed=0,
        device_cache=True, device_cache_budget=budget,
    )
    state = trainer.fit()
    losses = [h["val_loss"] for h in trainer.history]
    print("steps:", int(state.step), "val_losses:", losses)
    assert int(state.step) == 3 * (32 // 8)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], "loss did not decrease"
    # auto budget path (PJRT memory_stats) must not crash either
    from mimo_unet_tpu.data.core import device_cache_budget_bytes
    print("auto budget MB:", (device_cache_budget_bytes() or 0) / 1e6)
    print("OK")


if __name__ == "__main__":
    main()
