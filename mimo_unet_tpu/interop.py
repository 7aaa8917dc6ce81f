"""Import PyTorch reference checkpoints into mimo_unet_tpu pytrees.

Lets users of the reference implementation (antonbaumann/MIMO-Unet) migrate:
a Lightning checkpoint trained there (``MimoUnetModel`` /
``EvidentialUnetModel``) loads directly into this framework's
``(params, state)`` pytrees.  Also the backbone of the golden parity tests.

Key mapping (reference module tree -> our pytree):
  model.encoder.in_convs.{i}.*   -> params['encoder']['in_conv'] (stacked [S])
  model.encoder.down1s.{i}.*     -> params['encoder']['down1']   (stacked [S])
  model.core.{down2,down3,down4} -> params['core'][name]
  model.core.{up1,up2,up3}       -> params['core'][name]
  model.decoder.up4s.{i}.*       -> params['decoder']['up4']     (stacked [S])
  model.decoder.outcs.{i}.*      -> params['decoder']['outc']    (stacked [S])

Weight layout conversions: Conv2d OIHW -> HWIO; ConvTranspose2d
[in, out, kh, kw] -> HWIO [kh, kw, in, out] (non-flipped; the op flips).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig


def _np(x) -> np.ndarray:
    """Owned copy — torch .numpy() views alias the tensor's storage, and
    jnp.asarray on CPU may alias the numpy buffer in turn; without a copy,
    later in-place torch updates (e.g. BN running stats) would silently
    mutate the converted pytree."""
    return np.array(x, copy=True)


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _conv_transpose(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [in, out, kh, kw]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[dict, dict]:
    params = {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }
    state = {
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"]).astype(np.float32)),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"]).astype(np.float32)),
    }
    return params, state


def _double_conv(sd, prefix: str) -> Tuple[dict, dict]:
    """``prefix`` points at a reference DoubleConv module (its .double_conv
    Sequential has conv at 0/3 and BN at 1/4, components.py:22-29)."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.double_conv.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.double_conv.4")
    params = {
        "conv1": _conv(sd, f"{prefix}.double_conv.0"),
        "bn1": bn1_p,
        "conv2": _conv(sd, f"{prefix}.double_conv.3"),
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _up(sd, prefix: str, mode: str) -> Tuple[dict, dict]:
    conv_p, conv_s = _double_conv(sd, f"{prefix}.conv")
    if mode == "transpose":
        return {"up": _conv_transpose(sd, f"{prefix}.up"), "conv": conv_p}, {
            "conv": conv_s
        }
    return {"conv": conv_p}, {"conv": conv_s}


def _stack(trees):
    """Stack a list of pytrees leaf-wise onto a new leading axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def normalize_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip Lightning / torch.compile prefixes ('model.', '_orig_mod.')."""
    out = {}
    for k, v in sd.items():
        for prefix in ("model.", "_orig_mod."):
            while k.startswith(prefix):
                k = k[len(prefix):]
        k = k.replace("._orig_mod.", ".")
        out[k] = v
    return out


def torch_state_dict_to_pytree(
    sd: Dict[str, np.ndarray], cfg: MimoUNetConfig
) -> Tuple[dict, dict]:
    """Convert a reference MimoUNet state_dict into (params, state)."""
    sd = normalize_state_dict(sd)
    s = cfg.num_subnetworks
    mode = cfg.mode

    enc = [
        (
            {"in_conv": ic[0], "down1": d1[0]},
            {"in_conv": ic[1], "down1": d1[1]},
        )
        for ic, d1 in (
            (
                _double_conv(sd, f"encoder.in_convs.{i}"),
                _double_conv(sd, f"encoder.down1s.{i}.conv"),
            )
            for i in range(s)
        )
    ]
    enc_params = _stack([p for p, _ in enc])
    enc_state = _stack([st for _, st in enc])

    core_params, core_state = {}, {}
    for name in ("down2", "down3", "down4"):
        p, st = _double_conv(sd, f"core.{name}.conv")
        core_params[name], core_state[name] = p, st
    for name in ("up1", "up2", "up3"):
        p, st = _up(sd, f"core.{name}", mode)
        core_params[name], core_state[name] = p, st

    dec = []
    for i in range(s):
        up4_p, up4_s = _up(sd, f"decoder.up4s.{i}", mode)
        outc = _conv(sd, f"decoder.outcs.{i}.conv")
        dec.append(({"up4": up4_p, "outc": outc}, {"up4": up4_s}))
    dec_params = _stack([p for p, _ in dec])
    dec_state = _stack([st for _, st in dec])

    params = {"encoder": enc_params, "core": core_params, "decoder": dec_params}
    state = {"encoder": enc_state, "core": core_state, "decoder": dec_state}
    return params, state


def load_reference_checkpoint(path: str):
    """Load a Lightning checkpoint produced by the PyTorch reference.

    Returns (cfg, params, state, hparams).  Requires torch at call time.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    cfg = MimoUNetConfig(
        in_channels=hparams["in_channels"],
        out_channels=hparams["out_channels"],
        num_subnetworks=hparams.get("num_subnetworks", 1),
        filter_base_count=hparams["filter_base_count"],
        center_dropout_rate=hparams.get("center_dropout_rate", 0.0),
        final_dropout_rate=hparams.get("final_dropout_rate", 0.0),
        encoder_dropout_rate=hparams.get("encoder_dropout_rate", 0.0),
        core_dropout_rate=hparams.get("core_dropout_rate", 0.0),
        decoder_dropout_rate=hparams.get("decoder_dropout_rate", 0.0),
        bilinear=True,
        use_pooling_indices=False,
    )
    params, state = torch_state_dict_to_pytree(sd, cfg)
    return cfg, params, state, hparams
