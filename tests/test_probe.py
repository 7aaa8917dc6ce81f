"""Compile-probe layer tests (ops/pallas/probe.py).

The round-3 failure class: the scoped-VMEM byte estimator accepted a
tile that Mosaic rejected at compile time, producing rc=1 in the driver
bench (BENCH_r03.json).  These tests force estimator/probe disagreements
and assert the picker (a) drops down the ladder instead of shipping an
uncompilable tile, (b) still produces correct gradients on the smaller
tile, (c) classifies the real Mosaic error text, and (d) caches probe
results across picker instances and on disk.
"""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_unet_tpu.ops.pallas import probe as probe_mod
from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas.ct_train import (
    conv3x3_ct_train,
    pick_th_kind,
    pick_th_kind_forced,
)

# the verbatim round-3 driver failure (BENCH_r03.json tail)
_R3_MSG = (
    "Internal: AOT PJRT error: Ran out of memory in memory space vmem "
    "while allocating on stack for %transpose_jvp_tr_dx_c24x0o24_th64w256"
    "... Scoped allocation with size 16.10M and limit 16.00M exceeded "
    "scoped vmem limit by 104.0K."
)


def _fake_probe(max_th):
    """probe_fits stand-in rejecting any kernel with tile height > max_th
    (the key encodes it as 'th<N>')."""

    def fake(key, build):
        th = int(re.search(r"th(\d+)", key).group(1))
        return th <= max_th

    return fake


class TestClassifier:
    def test_real_round3_error_is_vmem_oom(self):
        assert probe_mod.is_vmem_oom(RuntimeError(_R3_MSG))

    def test_unrelated_errors_propagate(self):
        assert not probe_mod.is_vmem_oom(ValueError("shape mismatch"))
        assert not probe_mod.is_vmem_oom(RuntimeError("HBM OOM"))


class TestCache:
    def test_memoizes_and_persists(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MIMO_TILE_CACHE",
                           str(tmp_path / "tiles.json"))
        monkeypatch.setattr(probe_mod, "_CACHE", {})
        monkeypatch.setattr(probe_mod, "_DISK_LOADED", False)
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return (lambda x: x + 1,
                    (jax.ShapeDtypeStruct((8, 128), jnp.float32),))

        assert probe_mod.probe_fits("k1", build)
        assert probe_mod.probe_fits("k1", build)
        assert calls["n"] == 1
        # a fresh in-process cache must find the persisted result
        monkeypatch.setattr(probe_mod, "_CACHE", {})
        monkeypatch.setattr(probe_mod, "_DISK_LOADED", False)
        assert probe_mod.probe_fits("k1", build)
        assert calls["n"] == 1
        data = json.loads((tmp_path / "tiles.json").read_text())
        assert any(k.endswith("|k1") and v for k, v in data.items())


class TestLadderFallback:
    def test_probe_rejection_drops_a_rung(self, monkeypatch):
        monkeypatch.setattr(probe_mod, "probing_enabled", lambda: True)
        monkeypatch.setattr(probe_mod, "probe_fits", _fake_probe(16))
        # estimator accepts th=64 at this narrow shape; the probe veto
        # must drop the pick to 16, not ship 64 (the BENCH_r03 mode)
        assert pick_th_kind("fwd", 64, 256, 8, 0, 8, prologue=False) == (16, 1)
        from mimo_unet_tpu.ops.pallas.ct_conv import pick_th, pick_th9

        assert pick_th(64, 256, 8, 0, 8, 8, 8) == (16, 1)
        assert pick_th9(64, 256, 3, 8, 8) == (16, 1)

    def test_forced_fallback_is_probed(self, monkeypatch):
        monkeypatch.setattr(probe_mod, "probing_enabled", lambda: True)
        monkeypatch.setattr(probe_mod, "probe_fits", _fake_probe(4))
        assert pick_th_kind_forced("dw", 64, 256, 8, 0, 8, 64,
                                   prologue=True) == (4, 1)

    def test_nothing_compiles_raises(self, monkeypatch):
        monkeypatch.setattr(probe_mod, "probing_enabled", lambda: True)
        monkeypatch.setattr(probe_mod, "probe_fits", _fake_probe(0))
        with pytest.raises(RuntimeError, match="scoped VMEM"):
            pick_th_kind_forced("dw", 64, 256, 8, 0, 8, 64, prologue=True)

    def test_off_tpu_keeps_historical_fallback(self):
        assert pick_th_kind_forced("dw", 64, 256, 8, 0, 8, 64,
                                   prologue=True) == (16, 1)
        assert pick_th_kind_forced("dx", 64, 256, 8, 0, 8, 8,
                                   prologue=False) == (8, 1)


class TestEstimatorLieStillTrains:
    def test_grads_correct_on_demoted_tiles(self, monkeypatch):
        """With the probe vetoing every tile the backward rule would
        prefer (th > 4), one train conv's gradients must still match the
        XLA reference — the demoted dx/dw tiles change scheduling, not
        math."""
        monkeypatch.setattr(probe_mod, "probing_enabled", lambda: True)
        monkeypatch.setattr(probe_mod, "probe_fits", _fake_probe(4))
        c1, o, h, w, n, groups, th = 5, 6, 16, 256, 2, 2, 8
        ks = jax.random.split(jax.random.key(3), 5)
        x1n = jax.random.normal(ks[0], (n, h, w, c1)).astype(jnp.bfloat16)
        wconv = jax.random.normal(ks[1], (groups, 3, 3, c1, o)) * 0.2
        c1a = align8(c1)
        wp = jnp.stack([pack_w3x3([wconv[g]]) for g in range(groups)])
        x1 = jnp.moveaxis(x1n, -1, 0).reshape(c1, -1)
        cy = jax.random.normal(ks[2], (o, n * h * w)) * 0.1

        def loss_k(x1, wp):
            y, s, q = conv3x3_ct_train(
                x1, None, wp, None, None, h, w, th, c1, 0, o, 0, True)
            return (jnp.sum(y[:o].astype(jnp.float32) * cy)
                    + jnp.sum(s) + 0.1 * jnp.sum(q))

        from jax import lax

        from mimo_unet_tpu.ops.conv import reflect_pad1

        cy_n = jnp.moveaxis(cy.reshape(o, n, h, w), 0, -1)

        def loss_r(x1n, wconv):
            npg = n // groups
            outs = [lax.conv_general_dilated(
                reflect_pad1(x1n[g * npg:(g + 1) * npg]),
                wconv[g].astype(x1n.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for g in range(groups)]
            y = jnp.concatenate(outs, axis=0).astype(jnp.float32)
            return (jnp.sum(y * cy_n) + jnp.sum(y)
                    + 0.1 * jnp.sum(jnp.square(y)))

        lk, gk = jax.value_and_grad(loss_k, argnums=(0, 1))(x1, wp)
        lr, gr = jax.value_and_grad(loss_r, argnums=(0, 1))(x1n, wconv)
        assert abs(float(lk - lr)) <= 2e-3 * abs(float(lr)) + 1e-3
        gx_r = jnp.moveaxis(gr[0], -1, 0).reshape(c1, -1).astype(np.float32)
        np.testing.assert_allclose(
            gk[0][:c1].astype(np.float32), gx_r,
            atol=3e-2 * float(jnp.max(jnp.abs(gx_r))))
        oa = align8(o)
        for g in range(groups):
            got = jnp.stack([
                jnp.stack([gk[1][g, dy * c1a:dy * c1a + c1,
                                 dx * oa:dx * oa + o]
                           for dx in range(3)])
                for dy in range(3)])
            np.testing.assert_allclose(
                np.asarray(got, np.float32),
                np.asarray(gr[1][g], np.float32),
                atol=3e-2 * float(jnp.max(jnp.abs(gr[1][g]))))
