"""Recurrent (ConvLSTM) model family on the cubed sphere and lat-lon grid.

Capability parity with the reference's recurrent path: ``DLWPNeuralNet``
accepts ``is_recurrent=True`` and assembles Keras ``ConvLSTM2D`` layers by
name (``DLWP/model/models.py`` — SURVEY.md §2 rows 5-6; the 2019 lat-lon
paper's LSTM variants), with the ``RNNResetStates`` callback zeroing states
each epoch (§2 row 5).

TPU-first redesign:

- One fused gate convolution per step: Keras splits input/recurrent kernels
  into two convolutions; here a single cubed-sphere (or lat-lon) convolution
  over ``concat([x, h])`` produces all four gates at once — mathematically
  identical (``W·[x;h] = Wx·x + Wh·h``) and one MXU call instead of eight.
- The time loop is an ``nn.scan`` (``lax.scan`` under jit): the whole
  sequence runs as one compiled program, weights broadcast across steps.
- State is an explicit functional carry.  "Stateful" Keras semantics +
  ``RNNResetStates`` reduce to: a fresh call starts from the zero carry (the
  per-epoch reset, by construction), and callers that want cross-call state
  pass/receive the carry explicitly (`CubeSphereConvLSTM.__call__`'s
  ``initial_carry`` / ``return_carry``).
- Drop-in with the rest of the framework: :class:`CubeSphereConvLSTMNet`
  consumes the standard *folded* channel layout
  ``[t·vars | t·insol | constants]`` (``data/channels.py``) and emits folded
  multi-step outputs, so SeriesDataset / Trainer / TimeSeriesEstimator /
  the sharded paths all work unchanged.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from dlwp_cs_tpu.models.config import ConvLSTMConfig
from dlwp_cs_tpu.models.latlon_unet import LatLonConv2D
from dlwp_cs_tpu.models.layers import CubeSphereConv2D

__all__ = [
    "CubeSphereConvLSTMCell",
    "LatLonConvLSTMCell",
    "CubeSphereConvLSTM",
    "CubeSphereConvLSTMNet",
]


class _ConvLSTMCellBase(nn.Module):
    """Shared gate math; subclasses provide the spatial convolution."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    forget_bias: float = 1.0  # Keras unit_forget_bias=True equivalent
    dtype: jnp.dtype | None = None

    def _gate_conv(self, name: str):  # pragma: no cover - abstract
        raise NotImplementedError

    @nn.compact
    def __call__(self, carry, x):
        """One step.  ``carry = (h, c)``; ``x`` spatial input for this step.

        Returns ``(new_carry, h_new)``.
        """
        h, c = carry
        z = self._gate_conv("gates")(jnp.concatenate([x, h.astype(x.dtype)], -1))
        i, f, g, o = jnp.split(z, 4, axis=-1)
        f32 = jnp.float32  # gate nonlinearity + state update in f32
        c_new = nn.sigmoid(f.astype(f32) + self.forget_bias) * c.astype(f32)
        c_new = c_new + nn.sigmoid(i.astype(f32)) * jnp.tanh(g.astype(f32))
        h_new = nn.sigmoid(o.astype(f32)) * jnp.tanh(c_new)
        # preserve the caller's carry dtypes: lax.scan requires identical
        # carry input/output avals, so a cell-dtype (e.g. bf16) h and the
        # f32 c must each come back in their OWN dtype — casting h to
        # x.dtype broke scan whenever cell dtype != input dtype.  The
        # emitted output stays in the input dtype.
        return (h_new.astype(h.dtype), c_new.astype(c.dtype)), \
            h_new.astype(x.dtype)

    def initialize_carry(self, x_like):
        """Zero carry matching a step input ``x_like`` (spatial dims kept,
        channels replaced by ``features``)."""
        shape = x_like.shape[:-1] + (self.features,)
        dtype = self.dtype if self.dtype is not None else x_like.dtype
        return (
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, jnp.float32),
        )


class CubeSphereConvLSTMCell(_ConvLSTMCellBase):
    """ConvLSTM cell whose gate convolution is a cubed-sphere conv
    (fused halo exchange, equatorial/polar weight groups)."""

    separate_polar_weights: bool = True
    backend: str = "auto"

    def _gate_conv(self, name: str):
        return CubeSphereConv2D(
            features=4 * self.features,
            kernel_size=self.kernel_size,
            separate_polar_weights=self.separate_polar_weights,
            backend=self.backend,
            dtype=self.dtype,
            name=name,
        )


class LatLonConvLSTMCell(_ConvLSTMCellBase):
    """ConvLSTM cell on the legacy lat-lon grid (periodic longitude)."""

    lat_mode: str = "reflect"

    def _gate_conv(self, name: str):
        return LatLonConv2D(
            features=4 * self.features,
            kernel_size=self.kernel_size,
            lat_mode=self.lat_mode,
            dtype=self.dtype,
            name=name,
        )


class CubeSphereConvLSTM(nn.Module):
    """ConvLSTM layer over a time sequence ``(B, T, *spatial, C)``.

    ``return_sequences=True`` yields all hidden states ``(B, T, ..., F)``;
    otherwise the final hidden state ``(B, ..., F)``.  ``return_carry=True``
    additionally returns the final ``(h, c)`` for stateful continuation
    (the functional replacement for Keras stateful RNNs; passing it back as
    ``initial_carry`` continues the sequence, omitting it is the
    ``RNNResetStates`` per-epoch reset).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    cell_cls: Callable = CubeSphereConvLSTMCell
    cell_kwargs: dict | None = None
    return_sequences: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xs, initial_carry=None, *, return_carry: bool = False):
        cell = self.cell_cls(
            features=self.features,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="cell",
            **(self.cell_kwargs or {}),
        )
        if initial_carry is None:
            initial_carry = cell.initialize_carry(xs[:, 0])
        scan = nn.scan(
            type(cell).__call__,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, hs = scan(cell, initial_carry, xs)
        out = hs if self.return_sequences else carry[0]
        return (out, carry) if return_carry else out


class CubeSphereConvLSTMNet(nn.Module):
    """Stacked ConvLSTM forecast network, drop-in for CubeSphereUNet.

    Input: the standard folded layout ``(B, 6, n, n, C)`` with
    ``C = T_in*C_var + [T_in insolation] + [constants]`` (``data/channels.py``).
    Internally unfolds to the ``(B, T_in, 6, n, n, C_step)`` sequence the
    recurrent stack consumes (constants tiled per step), runs
    ``len(filters)`` ConvLSTM layers (all but the last return sequences),
    and predicts all output steps from the final hidden state through a
    linear conv head — the same folded multi-step output contract as the
    U-Net, so rollout/training paths are unchanged.
    """

    config: ConvLSTMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        t = cfg.input_time_steps
        cv = cfg.variable_channels
        k = x.shape[-1] - t * cv - (t if cfg.add_insolation else 0)
        if k < 0:
            raise ValueError(
                f"input channels {x.shape[-1]} < folded prognostic+insolation "
                f"channels for T_in={t}, C_var={cv}"
            )
        x = x.astype(dtype)

        # Unfold (B, 6, n, n, C) -> (B, T, 6, n, n, C_step).
        from dlwp_cs_tpu.data.channels import unfold_time

        parts = [unfold_time(x[..., : t * cv], t)]
        if cfg.add_insolation:
            parts.append(unfold_time(x[..., t * cv : t * cv + t], t))
        if k:
            const = x[..., -k:]  # (B, 6, n, n, K) -> tile over time
            parts.append(
                jnp.broadcast_to(
                    const[:, None], (const.shape[0], t) + const.shape[1:]
                )
            )
        seq = jnp.concatenate(parts, axis=-1)

        cell_kwargs = dict(
            separate_polar_weights=cfg.separate_polar_weights,
            backend=cfg.conv_backend,
        )
        h = seq
        for layer, feats in enumerate(cfg.filters):
            last = layer == len(cfg.filters) - 1
            h = CubeSphereConvLSTM(
                features=feats,
                kernel_size=cfg.kernel_size,
                cell_cls=CubeSphereConvLSTMCell,
                cell_kwargs=cell_kwargs,
                return_sequences=not last,
                dtype=dtype,
                name=f"convlstm{layer}",
            )(h)

        out = CubeSphereConv2D(
            features=cfg.output_channels,
            kernel_size=cfg.head_kernel_size,
            separate_polar_weights=cfg.separate_polar_weights,
            backend=cfg.conv_backend,
            dtype=dtype,
            name="head",
        )(h)
        return out.astype(jnp.float32)
