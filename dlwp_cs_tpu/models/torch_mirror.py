"""PyTorch mirror of the cubed-sphere model family.

Capability parity with the reference's ``DLWP/model/models_torch.py``
(``DLWPTorchNN`` — SURVEY.md §2 row 8): a secondary-backend counterpart
demonstrating the framework's model/weight contract is backend-agnostic.

Redesigned role for this framework: beyond API parity, the mirror is a
**cross-framework numerical oracle**.  Parameters are framework-neutral
pytrees (orbax/JSON on disk), so the torch mirror loads the *same* trained
flax parameters (``load_flax_params``) and must reproduce the JAX forward
pass within float tolerance — an independent re-implementation of the halo
padding, grouped convolution and U-Net assembly against which the
JAX/Pallas paths are pinned (``tests/test_torch_mirror.py``).  With the
reference mount empty (SURVEY.md §0), this is the strongest available
substitute for the reference-allclose oracle, and it stays useful after:
any future TF/torch golden run can be checked against both backends.

CPU-only by design (torch in this image is CPU torch); the TPU compute path
is the JAX one.  Torch is imported lazily so the rest of the package never
depends on it.
"""

from __future__ import annotations

import numpy as np

from dlwp_cs_tpu.geometry.cubed_sphere import (
    EDGE_E,
    EDGE_N,
    EDGE_S,
    EDGE_W,
    edge_table,
)
from dlwp_cs_tpu.models.config import UNetConfig

__all__ = ["torch_cs_pad", "TorchCubeSphereConv2D", "TorchCubeSphereUNet"]


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the torch mirror requires pytorch (CPU build is sufficient)"
        ) from e
    return torch


def _edge_strip(torch, xf, edge: int, w: int):
    """Mirror of ops/padding._edge_strip for NHWC torch tensors ``(B,n,n,C)``:
    returns ``(B, w, n, C)`` indexed [depth-from-edge, along-edge-t]."""
    if edge == EDGE_S:
        return xf[:, :w, :, :]
    if edge == EDGE_N:
        return torch.flip(xf[:, -w:, :, :], dims=(1,))
    if edge == EDGE_W:
        return xf[:, :, :w, :].transpose(1, 2)
    if edge == EDGE_E:
        return torch.flip(xf[:, :, -w:, :], dims=(2,)).transpose(1, 2)
    raise ValueError(f"bad edge {edge}")


def torch_cs_pad(x, width: int):
    """Cross-face halo padding, torch re-implementation of ``ops.padding.cs_pad``.

    ``x``: ``(B, 6, n, n, C)`` channels-last torch tensor; returns
    ``(B, 6, n+2w, n+2w, C)`` with identical ghost/corner semantics (edge
    ghosts copied from neighbor interiors per the numerically-derived edge
    table; corners = mean of the two flanking edge ghosts).
    """
    torch = _torch()
    b, nf, n, n2, c = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {tuple(x.shape)}")
    w = int(width)
    table = edge_table()
    faces = []
    for f in range(6):
        pf = torch.zeros((b, n + 2 * w, n + 2 * w, c), dtype=x.dtype)
        pf[:, w : w + n, w : w + n, :] = x[:, f]
        for e in range(4):
            link = table[f][e]
            strip = _edge_strip(torch, x[:, link.face], link.edge, w)
            if link.reverse:
                strip = torch.flip(strip, dims=(2,))
            if e == EDGE_S:
                pf[:, :w, w : w + n, :] = torch.flip(strip, dims=(1,))
            elif e == EDGE_N:
                pf[:, w + n :, w : w + n, :] = strip
            elif e == EDGE_W:
                pf[:, w : w + n, :w, :] = torch.flip(strip, dims=(1,)).transpose(1, 2)
            else:  # EDGE_E
                pf[:, w : w + n, w + n :, :] = strip.transpose(1, 2)
        # corners: mean of the two flanking edge ghosts (replicate-extended)
        pf[:, :w, :w, :] = 0.5 * (pf[:, :w, w : w + 1, :] + pf[:, w : w + 1, :w, :])
        pf[:, :w, w + n :, :] = 0.5 * (
            pf[:, :w, w + n - 1 : w + n, :] + pf[:, w : w + 1, w + n :, :]
        )
        pf[:, w + n :, :w, :] = 0.5 * (
            pf[:, w + n :, w : w + 1, :] + pf[:, w + n - 1 : w + n, :w, :]
        )
        pf[:, w + n :, w + n :, :] = 0.5 * (
            pf[:, w + n :, w + n - 1 : w + n, :]
            + pf[:, w + n - 1 : w + n, w + n :, :]
        )
        faces.append(pf)
    return torch.stack(faces, dim=1)


class TorchCubeSphereConv2D:
    """Grouped (equatorial/polar) cubed-sphere convolution, torch backend.

    Weights are held as numpy HWIO arrays (the framework's neutral layout)
    and converted to torch OIHW at call time; faces 0-3 use the equatorial
    kernel, 4-5 the polar kernel — the same grouping as ``ops.conv.cs_conv``.
    """

    def __init__(self, kernel_eq, kernel_pole, bias_eq=None, bias_pole=None):
        self.kernel_eq = np.asarray(kernel_eq)
        self.kernel_pole = np.asarray(kernel_pole)
        self.bias_eq = None if bias_eq is None else np.asarray(bias_eq)
        self.bias_pole = None if bias_pole is None else np.asarray(bias_pole)

    @staticmethod
    def from_flax(scope: dict) -> "TorchCubeSphereConv2D":
        """Build from one flax CubeSphereConv2D param scope."""
        return TorchCubeSphereConv2D(
            scope["kernel_eq"],
            scope.get("kernel_pole", scope["kernel_eq"]),
            scope.get("bias_eq"),
            scope.get("bias_pole", scope.get("bias_eq")),
        )

    def __call__(self, x):
        torch = _torch()
        import torch.nn.functional as F

        kh, kw = self.kernel_eq.shape[:2]
        w = (max(kh, kw) - 1) // 2
        xp = torch_cs_pad(x, w) if w else x
        # non-square kernels: crop the surplus halo per axis so VALID conv
        # keeps the 'same' output shape (mirrors ops/conv.py)
        wy, wx = (kh - 1) // 2, (kw - 1) // 2
        if wy < w:
            xp = xp[:, :, w - wy : xp.shape[2] - (w - wy)]
        if wx < w:
            xp = xp[:, :, :, w - wx : xp.shape[3] - (w - wx)]
        b, _, hp, wp, c = xp.shape

        def group(faces, kernel, bias):
            # (B, F, hp, wp, C) -> (B*F, C, hp, wp) VALID conv -> back
            g = faces.reshape(-1, hp, wp, c).permute(0, 3, 1, 2)
            wt = torch.from_numpy(
                np.ascontiguousarray(np.transpose(kernel, (3, 2, 0, 1)))
            ).to(x.dtype)
            bt = None if bias is None else torch.from_numpy(bias.copy()).to(x.dtype)
            out = F.conv2d(g, wt, bt)
            out = out.permute(0, 2, 3, 1)
            return out.reshape(b, faces.shape[1], out.shape[1], out.shape[2], -1)

        eq = group(xp[:, :4], self.kernel_eq, self.bias_eq)
        pole = group(xp[:, 4:], self.kernel_pole, self.bias_pole)
        return torch.cat([eq, pole], dim=1)


def _avg_pool(x, window: int = 2):
    b, f, h, w, c = x.shape
    return x.reshape(b, f, h // window, window, w // window, window, c).mean(
        dim=(3, 5)
    )


def _max_pool(x, window: int = 2):
    b, f, h, w, c = x.shape
    return (
        x.reshape(b, f, h // window, window, w // window, window, c)
        .amax(dim=5)
        .amax(dim=3)
    )


def _upsample_nearest(x, factor: int = 2):
    return x.repeat_interleave(factor, dim=2).repeat_interleave(factor, dim=3)


class TorchCubeSphereUNet:
    """Torch mirror of :class:`dlwp_cs_tpu.models.unet.CubeSphereUNet`.

    Construct from the same :class:`UNetConfig`, then ``load_flax_params``
    with a trained flax param tree; ``__call__`` reproduces the JAX forward
    (float32) on CPU torch.  Inference-only (``torch.no_grad``): training
    runs on the JAX/TPU path.
    """

    def __init__(self, config: UNetConfig):
        if config.upsample != "nearest":
            raise NotImplementedError("torch mirror supports nearest upsampling")
        self.config = config
        self._convs: dict[str, TorchCubeSphereConv2D] = {}

    # -- weights -----------------------------------------------------------
    def load_flax_params(self, params) -> "TorchCubeSphereUNet":
        tree = params.get("params", params)
        self._convs = {
            name: TorchCubeSphereConv2D.from_flax(
                {k: np.asarray(v) for k, v in scope.items()}
            )
            for name, scope in tree.items()
        }
        return self

    # -- forward -----------------------------------------------------------
    def _act(self, x):
        torch = _torch()
        cfg = self.config
        if cfg.activation == "leaky_relu":
            return torch.nn.functional.leaky_relu(x, cfg.activation_slope)
        if cfg.activation == "relu":
            return torch.relu(x)
        if cfg.activation == "gelu":
            return torch.nn.functional.gelu(x)
        if cfg.activation == "tanh":
            return torch.tanh(x)
        raise ValueError(f"unknown activation {self.config.activation!r}")

    def _block(self, x, name):
        for i in range(self.config.convs_per_block):
            x = self._act(self._convs[f"{name}_conv{i}"](x))
        return x

    def __call__(self, x):
        torch = _torch()
        if not self._convs:
            raise RuntimeError("call load_flax_params first")
        if isinstance(x, np.ndarray):
            x = torch.from_numpy(x)
        x = x.to(torch.float32)
        cfg = self.config
        pool = _avg_pool if cfg.pooling == "avg" else _max_pool
        depth = len(cfg.filters)
        with torch.no_grad():
            skips = []
            for level in range(depth - 1):
                x = self._block(x, f"enc{level}")
                skips.append(x)
                x = pool(x, 2)
            x = self._block(x, f"enc{depth - 1}")
            for level in range(depth - 2, -1, -1):
                x = _upsample_nearest(x, 2)
                x = torch.cat([x, skips[level]], dim=-1)
                x = self._block(x, f"dec{level}")
            return self._convs["head"](x)
