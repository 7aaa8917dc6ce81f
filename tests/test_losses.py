"""Losses, loss buffer, transforms and metrics vs closed-form/torch oracles."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mimo_unet_tpu.losses import (
    EvidentialLoss,
    GaussianNLL,
    LaplaceNLL,
    UncertaintyLoss,
)
from mimo_unet_tpu.loss_buffer import (
    LossBufferState,
    loss_buffer_add,
    loss_buffer_init,
    loss_buffer_weights,
)
from mimo_unet_tpu.metrics import compute_regression_metrics
from mimo_unet_tpu.transforms import (
    apply_input_transform,
    compute_uncertainties,
    flatten_subnetwork_dimension,
    repeat_subnetworks,
)

from conftest import requires_reference, import_reference


class TestFromName:
    def test_factory(self):
        assert isinstance(UncertaintyLoss.from_name("gaussian_nll"), GaussianNLL)
        assert isinstance(UncertaintyLoss.from_name("laplace_nll"), LaplaceNLL)
        with pytest.raises(ValueError):
            UncertaintyLoss.from_name("nope")

    def test_num_params(self):
        assert GaussianNLL.num_distribution_params == 2
        assert LaplaceNLL.num_distribution_params == 2
        assert EvidentialLoss.num_distribution_params == 4


@requires_reference
class TestLossParityVsReference:
    """Golden parity against the PyTorch reference, including gradients."""

    @pytest.mark.parametrize("name", ["gaussian_nll", "laplace_nll"])
    def test_forward_and_grad(self, rng, name):
        ref = import_reference()
        from mimo.losses import UncertaintyLoss as RefLoss

        y_hat = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        # include log-params outside the clamp range to exercise the
        # straight-through no-grad clamp on both ends
        log_p = rng.uniform(-15, 9, (2, 3, 4, 4)).astype(np.float32)
        y = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
        mask = (rng.uniform(size=(2, 3, 4, 4)) > 0.3).astype(np.float32)

        tref = RefLoss.from_name(name)
        t_yh = torch.tensor(y_hat, requires_grad=True)
        t_lp = torch.tensor(log_p, requires_grad=True)
        t_loss = tref.forward(t_yh, t_lp, torch.tensor(y), mask=torch.tensor(mask))
        t_loss.backward()

        mine = UncertaintyLoss.from_name(name)
        loss_fn = lambda yh, lp: mine(yh, lp, jnp.asarray(y), mask=jnp.asarray(mask))
        loss = loss_fn(jnp.asarray(y_hat), jnp.asarray(log_p))
        np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)

        g_yh, g_lp = jax.grad(loss_fn, argnums=(0, 1))(
            jnp.asarray(y_hat), jnp.asarray(log_p)
        )
        np.testing.assert_allclose(
            np.asarray(g_yh), t_yh.grad.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_lp), t_lp.grad.numpy(), rtol=1e-4, atol=1e-6
        )

    @pytest.mark.parametrize("name", ["gaussian_nll", "laplace_nll"])
    def test_std_mode_dist_param(self, rng, name):
        import_reference()
        from mimo.losses import UncertaintyLoss as RefLoss

        mu = rng.standard_normal((3, 5)).astype(np.float32)
        log_p = rng.uniform(-14, 8, (3, 5)).astype(np.float32)
        std = np.abs(rng.standard_normal((3, 5)).astype(np.float32)) + 1e-4

        tref = RefLoss.from_name(name)
        mine = UncertaintyLoss.from_name(name)

        np.testing.assert_allclose(
            np.asarray(mine.std(jnp.asarray(mu), jnp.asarray(log_p))),
            tref.std(torch.tensor(mu), torch.tensor(log_p)).numpy(),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mine.mode(jnp.asarray(mu), jnp.asarray(log_p))), mu
        )
        for log in (False, True):
            np.testing.assert_allclose(
                np.asarray(mine.calculate_dist_param(jnp.asarray(std), log=log)),
                tref.calculate_dist_param(torch.tensor(std), log=log).numpy(),
                rtol=1e-5,
            )

    def test_evidential(self, rng):
        import_reference()
        from mimo.losses import EvidentialLoss as RefEv

        b, h, w = 2, 4, 4
        out = np.stack(
            [
                rng.standard_normal((b, h, w)),
                np.abs(rng.standard_normal((b, h, w))) + 0.1,  # v > 0
                np.abs(rng.standard_normal((b, h, w))) + 1.1,  # alpha > 1
                np.abs(rng.standard_normal((b, h, w))) + 0.1,  # beta > 0
            ],
            axis=1,
        ).astype(np.float32)
        y = rng.standard_normal((b, 1, h, w)).astype(np.float32)

        tref = RefEv(coeff=1.0)
        want = tref.forward(torch.tensor(out), torch.tensor(y)).numpy()
        mine = EvidentialLoss(coeff=1.0)
        # mine is NHWC channels-last; reference is NCHW axis-1
        out_nhwc = jnp.asarray(np.moveaxis(out, 1, -1))
        y_nhwc = jnp.asarray(np.moveaxis(y, 1, -1))
        got = mine(out_nhwc, y_nhwc)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)

        np.testing.assert_allclose(
            np.asarray(mine.aleatoric_var(out_nhwc)),
            RefEv.aleatoric_var(torch.tensor(out)).numpy(),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mine.epistemic_var(out_nhwc)),
            RefEv.epistemic_var(torch.tensor(out)).numpy(),
            rtol=1e-5,
        )


class TestClampSemantics:
    def test_forward_clamped_but_grad_unclamped(self):
        """The parity trap: clamp affects values, not the exp gradient path."""
        loss = GaussianNLL()
        y_hat = jnp.zeros((1,))
        y = jnp.zeros((1,))
        log_var = jnp.array([-20.0])  # exp = 2e-9, clamps to 1e-5

        val = loss(y_hat, log_var, y)
        np.testing.assert_allclose(float(val), np.log(1e-5), rtol=1e-6)

        # d/dlogvar [log(v_c) + 0/v_c] with v_c treated as clamped constant
        # and dv_c/dlogvar = exp(logvar):  (1/1e-5) * exp(-20)
        g = jax.grad(lambda lv: loss(y_hat, lv, y))(log_var)
        np.testing.assert_allclose(float(g[0]), np.exp(-20.0) / 1e-5, rtol=1e-5)


class TestLossBuffer:
    def test_uniform_before_fill_and_reweighting(self):
        s, size, temp = 3, 4, 1.0
        state = loss_buffer_init(s, size)
        w = loss_buffer_weights(state, temp, size)
        np.testing.assert_allclose(np.asarray(w), np.ones(s), rtol=1e-6)

        # after adds, lagging subnetwork (higher loss) gets more weight
        for loss in ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]):
            state = loss_buffer_add(state, jnp.asarray(loss), size)
        w = np.asarray(loss_buffer_weights(state, temp, size))
        assert w[2] > w[1] > w[0]
        np.testing.assert_allclose(w.sum(), s, rtol=1e-6)

    def test_ring_wraparound(self):
        s, size = 2, 2
        state = loss_buffer_init(s, size)
        for v in (1.0, 2.0, 3.0):  # third add overwrites slot 0
            state = loss_buffer_add(state, jnp.full((s,), v), size)
        np.testing.assert_allclose(np.asarray(state.buffer), [[3.0, 3.0], [2.0, 2.0]])
        assert int(state.index) == 1

    def test_disabled_buffer(self):
        s = 4
        state = loss_buffer_init(s, 0)
        state = loss_buffer_add(state, jnp.arange(s, dtype=jnp.float32), 0)
        np.testing.assert_allclose(
            np.asarray(loss_buffer_weights(state, 1.0, 0)), np.ones(s)
        )

    @requires_reference
    def test_weights_match_reference(self, rng):
        import_reference()
        from mimo.models.mimo_components.loss_buffer import LossBuffer as RefBuffer

        s, size, temp = 3, 5, 0.7
        ref = RefBuffer(subnetworks=s, temperature=temp, buffer_size=size)
        state = loss_buffer_init(s, size)
        for _ in range(7):
            loss = rng.standard_normal(s).astype(np.float32)
            ref.add(torch.tensor(loss))
            state = loss_buffer_add(state, jnp.asarray(loss), size)
        np.testing.assert_allclose(
            np.asarray(loss_buffer_weights(state, temp, size)),
            ref.get_weights().numpy(),
            rtol=1e-5,
        )


class TestTransforms:
    def test_input_transform_shapes_and_content(self):
        key = jax.random.key(0)
        b, s, reps = 8, 3, 2
        img = jnp.arange(b, dtype=jnp.float32)[:, None, None, None] * jnp.ones((b, 4, 4, 2))
        lbl = img[..., :1] * 10
        img_t, lbl_t, mask_t = apply_input_transform(
            key, img, lbl, None, s, input_repetition_probability=0.25,
            batch_repetitions=reps,
        )
        assert img_t.shape == (b * reps, s, 4, 4, 2)
        assert lbl_t.shape == (b * reps, s, 4, 4, 1)
        assert mask_t is None
        # labels stay paired with images through the shuffle
        np.testing.assert_allclose(np.asarray(lbl_t[..., 0]), np.asarray(img_t[..., 0]) * 10)
        # each subnetwork column is a permutation of the tiled batch
        ids = np.asarray(img_t[:, :, 0, 0, 0]).astype(int)
        for j in range(s):
            np.testing.assert_array_equal(np.sort(ids[:, j]), np.repeat(np.arange(b), reps))

    def test_shared_tail_with_full_repetition(self):
        key = jax.random.key(1)
        b, s = 16, 4
        img = jnp.arange(b, dtype=jnp.float32)[:, None, None, None] * jnp.ones((b, 2, 2, 1))
        img_t, _, _ = apply_input_transform(
            key, img, img, None, s, input_repetition_probability=1.0
        )
        ids = np.asarray(img_t[:, :, 0, 0, 0])
        # p=1.0: all subnetworks see the identical (shared) batch order
        for j in range(1, s):
            np.testing.assert_array_equal(ids[:, j], ids[:, 0])

    def test_independent_with_zero_repetition(self):
        key = jax.random.key(2)
        b, s = 64, 2
        img = jnp.arange(b, dtype=jnp.float32)[:, None, None, None] * jnp.ones((b, 2, 2, 1))
        img_t, _, _ = apply_input_transform(key, img, img, None, s)
        ids = np.asarray(img_t[:, :, 0, 0, 0])
        assert not np.array_equal(ids[:, 0], ids[:, 1])

    def test_repeat_and_flatten(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 4, 4, 2)).astype(np.float32))
        r = repeat_subnetworks(x, 5)
        assert r.shape == (3, 5, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(r[:, 4]), np.asarray(x))
        f = flatten_subnetwork_dimension(r)
        assert f.shape == (15, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(f[5]), np.asarray(x[1]))

    @requires_reference
    def test_uncertainties_match_reference(self, rng):
        import_reference()
        from mimo.losses import LaplaceNLL as RefLaplace
        from mimo.models.utils import compute_uncertainties as ref_uncert

        y_preds = rng.standard_normal((2, 3, 1, 4, 4)).astype(np.float32)
        log_p = rng.uniform(-3, 1, (2, 3, 1, 4, 4)).astype(np.float32)
        want = ref_uncert(RefLaplace(), torch.tensor(y_preds), torch.tensor(log_p))
        got = compute_uncertainties(LaplaceNLL(), jnp.asarray(y_preds), jnp.asarray(log_p))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5, atol=1e-7)

    def test_uncertainties_single_subnetwork(self, rng):
        y = jnp.asarray(rng.standard_normal((2, 1, 4, 4, 1)).astype(np.float32))
        lp = jnp.zeros_like(y)
        _, _, epi = compute_uncertainties(GaussianNLL(), y, lp)
        np.testing.assert_allclose(np.asarray(epi), 0.0)


class TestMetrics:
    def test_against_sklearn_formulas(self, rng):
        y_hat = rng.standard_normal(100).astype(np.float32)
        y = rng.standard_normal(100).astype(np.float32)
        m = compute_regression_metrics(jnp.asarray(y_hat), jnp.asarray(y))
        np.testing.assert_allclose(float(m["mae"]), np.abs(y_hat - y).mean(), rtol=1e-6)
        np.testing.assert_allclose(float(m["mse"]), ((y_hat - y) ** 2).mean(), rtol=1e-6)
        np.testing.assert_allclose(float(m["rmse"]), np.sqrt(((y_hat - y) ** 2).mean()), rtol=1e-6)
        ss_res = ((y - y_hat) ** 2).sum()
        ss_tot = ((y - y.mean()) ** 2).sum()
        np.testing.assert_allclose(float(m["r2"]), 1 - ss_res / ss_tot, rtol=1e-5)

    @requires_reference
    def test_against_torchmetrics(self, rng):
        pytest.importorskip("torchmetrics")
        import_reference()
        from mimo.metrics import compute_regression_metrics as ref_metrics

        y_hat = rng.standard_normal(256).astype(np.float32)
        y = rng.standard_normal(256).astype(np.float32)
        want = ref_metrics(torch.tensor(y_hat), torch.tensor(y))
        got = compute_regression_metrics(jnp.asarray(y_hat), jnp.asarray(y))
        for k in want:
            np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=1e-4)
