"""Small shared utilities (reference mimo/utils.py:4-14)."""

from __future__ import annotations

import os
from argparse import ArgumentTypeError


def dir_path(path: str) -> str:
    """argparse validator: the argument must be an existing directory."""
    if os.path.isdir(path):
        return path
    raise ArgumentTypeError(f"{path} is not a valid path")


def count_trainable_parameters(params) -> int:
    from mimo_unet_tpu.models import count_parameters

    return count_parameters(params)
