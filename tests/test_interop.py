"""PyTorch reference checkpoint migration (interop) tests."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference, import_reference


@requires_reference
class TestReferenceCheckpointLoading:
    def test_lightning_ckpt_roundtrip(self, rng, tmp_path):
        """A Lightning-style .ckpt from the reference loads zero-config and
        the migrated model matches the torch forward."""
        import_reference()
        from mimo.models.mimo_components.model import MimoUNet as RefMimoUNet

        from mimo_unet_tpu.train.checkpoint import load_checkpoint

        torch.manual_seed(0)
        ref = RefMimoUNet(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=4, bilinear=True, use_pooling_indices=False,
        ).eval()

        # Lightning checkpoint schema: state_dict keys prefixed 'model.',
        # hyper_parameters dict (mimo_unet.py:83-87 save_hyperparameters)
        ckpt = {
            "state_dict": {f"model.{k}": v for k, v in ref.state_dict().items()},
            "hyper_parameters": {
                "in_channels": 3, "out_channels": 2, "num_subnetworks": 2,
                "filter_base_count": 4, "center_dropout_rate": 0.0,
                "final_dropout_rate": 0.0, "encoder_dropout_rate": 0.0,
                "core_dropout_rate": 0.0, "decoder_dropout_rate": 0.0,
                "loss": "laplace_nll", "weight_decay": 0.0,
                "learning_rate": 1e-3, "seed": 1, "loss_buffer_size": 10,
                "loss_buffer_temperature": 1.0,
            },
        }
        path = os.path.join(tmp_path, "ref.ckpt")
        torch.save(ckpt, path)

        task, state = load_checkpoint(path)
        assert task.num_subnetworks == 2
        assert task.loss == "laplace_nll"

        x = rng.standard_normal((2, 2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x)).numpy()
        x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        (p1, p2), _ = task.forward(state.params, state.model_state, x_nhwc, train=False)
        got = np.concatenate(
            [np.asarray(p1), np.asarray(p2)], axis=-1
        ).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_ensemble_accepts_reference_ckpt(self, tmp_path):
        import_reference()
        from mimo.models.mimo_components.model import MimoUNet as RefMimoUNet

        from mimo_unet_tpu.models.ensemble import Ensemble

        torch.manual_seed(1)
        ref = RefMimoUNet(3, 2, 1, filter_base_count=4)
        ckpt = {
            "state_dict": {f"model.{k}": v for k, v in ref.state_dict().items()},
            "hyper_parameters": {
                "in_channels": 3, "out_channels": 2, "num_subnetworks": 1,
                "filter_base_count": 4, "loss": "laplace_nll",
                "weight_decay": 0.0, "learning_rate": 1e-3, "seed": 0,
                "loss_buffer_size": 0, "loss_buffer_temperature": 1.0,
            },
        }
        path = os.path.join(tmp_path, "m.ckpt")
        torch.save(ckpt, path)
        ens = Ensemble([path])
        mean, ale, epi = ens(jnp.ones((1, 32, 32, 3)))
        assert mean.shape == (1, 32, 32, 1)
        np.testing.assert_allclose(np.asarray(epi), 0.0)  # single subnet
