"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """Build a Mesh over all available devices.

    Args:
      axes: ordered {axis_name: size}; sizes must multiply to the device
        count. Default: all devices on a single 'data' axis.
    """
    devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    sizes = list(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh axes {axes} need {np.prod(sizes)} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))
