"""torch <-> jax migration helpers.

For users moving off the torch reference: convert tensors (including the
reference's channels-first layouts) and adapt reference-style
``nn.Conv1d/Conv2d (kernel 1) + BatchNorm`` weights into this
framework's ``SharedMLP`` parameters.  torch is an optional dependency —
everything here imports it lazily and raises a clear error when absent.
"""

from __future__ import annotations

import numpy as np


def _require_torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "pytorch_points_tpu.compat.torch_bridge needs torch installed"
        ) from e
    return torch


def to_jax(tensor, channels_last: bool = False):
    """torch.Tensor -> jnp.ndarray.

    channels_last=True additionally converts the reference's [B, C, N]
    layout to this framework's [B, N, C]."""
    import jax.numpy as jnp

    torch = _require_torch()
    if isinstance(tensor, torch.Tensor):
        arr = tensor.detach().cpu().numpy()
    else:
        arr = np.asarray(tensor)
    out = jnp.asarray(arr)
    if channels_last and out.ndim == 3:
        out = jnp.swapaxes(out, 1, 2)
    return out


def from_jax(array, channels_first: bool = False):
    """jnp.ndarray -> torch.Tensor (CPU).

    channels_first=True converts [B, N, C] back to the reference's
    [B, C, N]."""
    torch = _require_torch()
    arr = np.asarray(array)
    if channels_first and arr.ndim == 3:
        arr = np.swapaxes(arr, 1, 2)
    return torch.from_numpy(np.ascontiguousarray(arr))


def linear_kernel_from_conv(weight):
    """Reference conv weight -> nnx.Linear kernel.

    The reference's shared MLPs are 1x1 convolutions: Conv1d weights
    [Cout, Cin, 1] or Conv2d [Cout, Cin, 1, 1].  The equivalent Linear
    kernel is the [Cin, Cout] transpose."""
    w = np.asarray(to_jax(weight))
    w = w.reshape(w.shape[0], w.shape[1])  # drop the 1(x1) taps
    return np.swapaxes(w, 0, 1)


def load_shared_mlp_from_torch(mlp, conv_weights, conv_biases=None,
                               bn_params=None):
    """Copy reference Conv(+BN) stack weights into a SharedMLP in place.

    Args:
      mlp: a :class:`pytorch_points_tpu.layers.SharedMLP`.
      conv_weights: list of torch conv weights ([Cout,Cin,1] or
        [Cout,Cin,1,1]), one per Linear layer.
      conv_biases: optional matching list of [Cout] biases (None entries
        allowed).
      bn_params: optional list of dicts with torch BatchNorm state
        (``weight``, ``bias``, ``running_mean``, ``running_var``), one
        per BatchNorm layer — only valid when the SharedMLP was built
        with ``norm="batch"``.  With ``act_last=False`` the last layer
        has no norm; pass one entry per REAL norm (None placeholders
        are also accepted and skipped).
    """
    import jax.numpy as jnp

    if len(conv_weights) != len(mlp.layers):
        raise ValueError(
            f"{len(conv_weights)} conv weights for {len(mlp.layers)} layers"
        )
    for i, (layer, w) in enumerate(zip(mlp.layers, conv_weights)):
        k = linear_kernel_from_conv(w)
        if k.shape != tuple(layer.kernel.shape):
            raise ValueError(
                f"layer {i}: conv gives kernel {k.shape}, "
                f"Linear expects {tuple(layer.kernel.shape)}"
            )
        layer.kernel[...] = jnp.asarray(k)
        if conv_biases is not None and conv_biases[i] is not None:
            layer.bias[...] = to_jax(conv_biases[i])
    if bn_params is not None:
        real_norms = [n for n in mlp.norms if n is not None]
        states = [p for p in bn_params if p is not None]
        if len(states) != len(real_norms):
            raise ValueError(
                f"{len(states)} BN states for {len(real_norms)} norm layers"
            )
        for norm, p in zip(real_norms, states):
            if not hasattr(norm, "mean"):
                raise ValueError(
                    "bn_params given but SharedMLP was not built with "
                    "norm='batch'"
                )
            norm.scale[...] = to_jax(p["weight"])
            norm.bias[...] = to_jax(p["bias"])
            norm.mean[...] = to_jax(p["running_mean"])
            norm.var[...] = to_jax(p["running_var"])
