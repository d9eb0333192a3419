"""Equiangular cubed-sphere geometry: the repo-wide topology contract.

This module is the single source of truth for the cubed-sphere grid used by
every op, model and pipeline stage in this framework. Everything downstream
(halo padding, convolution weight groups, remapping, verification) trusts only
this module for face layout, neighbor connectivity and cell geometry.

Capability parity: this plays the role of the implicit grid conventions baked
into the reference's ``DLWP/custom.py`` (CubeSpherePadding2D /
CubeSphereConv2D) and ``DLWP/remap/cubesphere.py`` (TempestRemap face
unfolding).  The reference never writes its topology down in one place; we
derive ours from first principles and lock it with property tests
(see SURVEY.md Appendix A — reference mount was empty, so the connectivity is
*computed* numerically at import time rather than transcribed).

Canonical conventions
---------------------
Earth-centered axes: X -> (lat 0, lon 0), Y -> (lat 0, lon 90E), Z -> North.

Each of the 6 faces carries equiangular local coordinates
``(a, b) in [-pi/4, pi/4]^2`` with gnomonic tangents ``xi = tan(a)``,
``eta = tan(b)``.  Face -> 3D (unnormalized):

==== ================== =========================
face location           P(xi, eta)
==== ================== =========================
0    equatorial lon 0   ( 1,   xi,  eta)
1    equatorial lon 90  (-xi,  1,   eta)
2    equatorial lon 180 (-1,  -xi,  eta)
3    equatorial lon 270 ( xi, -1,   eta)
4    north polar        (-eta, xi,  1 )
5    south polar        ( eta, xi, -1 )
==== ================== =========================

Array layout is ``[face, i, j]`` with row index ``i`` <-> ``b``/eta
(South->North on equatorial faces) and column index ``j`` <-> ``a``/xi
(West->East on equatorial faces).  Cell centers sit at
``a_k = -pi/4 + (k + 1/2) * (pi/2) / n``.

Design properties (all verified by tests/test_geometry.py):

* Every face chart is right-handed with respect to its *outward* normal, so
  the apparent chirality of flow patterns is identical on all 6 faces.  This
  is why — unlike the reference, which must flip the south-polar face to share
  a polar conv kernel — our polar weight group needs **no runtime flip**.
* ``eta`` points geographically north on all four equatorial faces, so one
  shared equatorial kernel sees a consistent "up".
* The 24 directed face edges form 12 undirected seams; the neighbor table is
  derived numerically by matching edge-segment midpoints in 3D (exact, since
  both sides lie on the cube-edge great-circle arcs) and is re-verified for
  the concrete resolution whenever a padding plan is built.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

__all__ = [
    "EDGE_S",
    "EDGE_N",
    "EDGE_W",
    "EDGE_E",
    "EQUATORIAL_FACES",
    "POLAR_FACES",
    "EdgeLink",
    "edge_table",
    "verify_edge_table",
    "CubedSphere",
    "face_xyz",
    "xyz_to_face",
    "xyz_to_face_angles",
]

# Edge identifiers. S/N are constant-row edges (i = 0 / i = n-1); W/E are
# constant-column edges (j = 0 / j = n-1).
EDGE_S, EDGE_N, EDGE_W, EDGE_E = 0, 1, 2, 3
_EDGE_NAMES = ("S", "N", "W", "E")

EQUATORIAL_FACES = (0, 1, 2, 3)
POLAR_FACES = (4, 5)

_QUARTER_PI = np.pi / 4.0


def _cell_center_angles(n: int) -> np.ndarray:
    """Equiangular cell-center angles a_k = -pi/4 + (k+1/2) * (pi/2)/n."""
    step = (np.pi / 2.0) / n
    return -_QUARTER_PI + (np.arange(n) + 0.5) * step


def face_xyz(face: int, xi, eta):
    """Map gnomonic coords on ``face`` to unnormalized 3D points.

    ``xi``/``eta`` are tangents of the equiangular coordinates; broadcasting
    numpy arrays are accepted. Returns an array with a trailing axis of 3.
    """
    xi = np.asarray(xi, dtype=np.float64)
    eta = np.asarray(eta, dtype=np.float64)
    one = np.ones(np.broadcast(xi, eta).shape)
    if face == 0:
        v = (one, xi, eta)
    elif face == 1:
        v = (-xi, one, eta)
    elif face == 2:
        v = (-one, -xi, eta)
    elif face == 3:
        v = (xi, -one, eta)
    elif face == 4:
        v = (-eta, xi, one)
    elif face == 5:
        v = (eta, xi, -one)
    else:
        raise ValueError(f"face must be in 0..5, got {face}")
    return np.stack(np.broadcast_arrays(*v), axis=-1)


# Outward unit normals of the 6 face centers, in face order.
_FACE_NORMALS = np.array(
    [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ]
)


def xyz_to_face(p: np.ndarray) -> np.ndarray:
    """Containing face index for 3D point(s) ``p`` (trailing axis 3)."""
    p = np.asarray(p, dtype=np.float64)
    return np.argmax(p @ _FACE_NORMALS.T, axis=-1)


def _face_local_exact(face: int, p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact chart inverses, derived from the face_xyz table."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    if face == 0:  # P = r*(1, xi, eta)
        return y / x, z / x
    if face == 1:  # P = r*(-xi, 1, eta)
        return -x / y, z / y
    if face == 2:  # P = r*(-1, -xi, eta)
        return y / x, -z / x
    if face == 3:  # P = r*(xi, -1, eta)
        return -x / y, -z / y
    if face == 4:  # P = r*(-eta, xi, 1)
        return y / z, -x / z
    if face == 5:  # P = r*(eta, xi, -1)
        return -y / z, -x / z
    raise ValueError(f"face must be in 0..5, got {face}")


def xyz_to_face_angles(p: np.ndarray):
    """(face, a, b) equiangular coordinates of 3D point(s) ``p``.

    Vectorized; ties on edges resolve to the lowest face index via argmax.
    """
    p = np.asarray(p, dtype=np.float64)
    face = xyz_to_face(p)
    xi = np.empty(face.shape)
    eta = np.empty(face.shape)
    for f in range(6):
        m = face == f
        if not np.any(m):
            continue
        xf, ef = _face_local_exact(f, p[m])
        xi[m] = xf
        eta[m] = ef
    return face, np.arctan(xi), np.arctan(eta)


@dataclass(frozen=True)
class EdgeLink:
    """Across edge ``e`` of a face lies ``face``'s edge ``edge``.

    ``reverse`` says whether the shared-edge coordinate runs in opposite
    index order on the two sides.
    """

    face: int
    edge: int
    reverse: bool


def _edge_segment_midpoints(face: int, edge: int, n: int) -> np.ndarray:
    """3D midpoints of the n boundary segments of (face, edge), unit norm.

    The k-th depth-0 cell along an edge owns the boundary arc segment whose
    angular midpoint (in the edge coordinate) is the cell-center angle.  These
    points lie exactly on the cube-edge arc, so matching them across faces is
    exact — the basis for deriving the neighbor table without any reference.
    """
    t = np.tan(_cell_center_angles(n))
    if edge == EDGE_S:
        xi, eta = t, np.full(n, -1.0)
    elif edge == EDGE_N:
        xi, eta = t, np.full(n, 1.0)
    elif edge == EDGE_W:
        xi, eta = np.full(n, -1.0), t
    elif edge == EDGE_E:
        xi, eta = np.full(n, 1.0), t
    else:
        raise ValueError(f"edge must be in 0..3, got {edge}")
    p = face_xyz(face, xi, eta)
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


@functools.lru_cache(maxsize=1)
def edge_table() -> tuple[tuple[EdgeLink, ...], ...]:
    """Numerically derived neighbor table: table[face][edge] -> EdgeLink.

    Derived once (resolution-independent topology) by exact 3D matching of
    edge-segment midpoints; every (face, edge) must match exactly one
    (face', edge') either in identical or reversed order.
    """
    n = 8
    mids = {
        (f, e): _edge_segment_midpoints(f, e, n) for f in range(6) for e in range(4)
    }
    table: list[list[EdgeLink | None]] = [[None] * 4 for _ in range(6)]
    for f in range(6):
        for e in range(4):
            matches = []
            for g in range(6):
                if g == f:
                    continue
                for e2 in range(4):
                    if np.allclose(mids[f, e], mids[g, e2], atol=1e-12):
                        matches.append(EdgeLink(g, e2, reverse=False))
                    elif np.allclose(mids[f, e], mids[g, e2][::-1], atol=1e-12):
                        matches.append(EdgeLink(g, e2, reverse=True))
            if len(matches) != 1:
                raise AssertionError(
                    f"face {f} edge {_EDGE_NAMES[e]}: expected exactly one "
                    f"neighbor, found {matches}"
                )
            table[f][e] = matches[0]
    # Symmetry sanity: the link must be mutual with identical reverse flag.
    # Explicit raise (not a bare assert): this guarantee must hold under
    # ``python -O`` too — it is the module's "topology can't rot silently"
    # contract.
    for f in range(6):
        for e in range(4):
            link = table[f][e]
            back = table[link.face][link.edge]
            if not (back.face == f and back.edge == e
                    and back.reverse == link.reverse):
                raise AssertionError(
                    f"edge table asymmetry: face {f} edge {e} links to "
                    f"{link}, which links back to {back}"
                )
    return tuple(tuple(row) for row in table)  # type: ignore[arg-type]


def verify_edge_table(n: int) -> None:
    """Re-assert edge-midpoint matching for a concrete resolution ``n``.

    Cheap (numpy, O(n)); called whenever a padding plan is constructed so a
    topology regression can never ship silently.
    """
    table = edge_table()
    for f in range(6):
        for e in range(4):
            link = table[f][e]
            a = _edge_segment_midpoints(f, e, n)
            b = _edge_segment_midpoints(link.face, link.edge, n)
            if link.reverse:
                b = b[::-1]
            if not np.allclose(a, b, atol=1e-12):
                raise AssertionError(
                    f"edge table mismatch at n={n}: face {f} edge "
                    f"{_EDGE_NAMES[e]} vs {link}"
                )


def _solid_angle_antiderivative(xi: np.ndarray, eta: np.ndarray) -> np.ndarray:
    """F with  integral dxi deta / (1+xi^2+eta^2)^(3/2) = F(xi2,eta2)-F(xi1,eta2)-F(xi2,eta1)+F(xi1,eta1)."""
    return np.arctan(xi * eta / np.sqrt(1.0 + xi * xi + eta * eta))


class CubedSphere:
    """Concrete C{n} equiangular cubed-sphere grid (cell-centered).

    Provides cell centers (3D / lat-lon), exact spherical cell areas, and the
    face connectivity used by halo padding.  All arrays are numpy float64 and
    laid out ``(6, n, n[, ...])`` in the canonical [face, i(b), j(a)] order.
    """

    def __init__(self, n: int):
        if n < 2:
            raise ValueError("cubed sphere resolution must be >= 2")
        self.n = int(n)
        self.table = edge_table()
        verify_edge_table(self.n)

    # -- geometry ----------------------------------------------------------
    @functools.cached_property
    def center_angles(self) -> np.ndarray:
        """(n,) equiangular cell-center angles."""
        return _cell_center_angles(self.n)

    @functools.cached_property
    def cell_xyz(self) -> np.ndarray:
        """(6, n, n, 3) unit cell-center positions."""
        t = np.tan(self.center_angles)
        eta, xi = np.meshgrid(t, t, indexing="ij")  # i<->eta rows, j<->xi cols
        out = np.stack([face_xyz(f, xi, eta) for f in range(6)], axis=0)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    @functools.cached_property
    def cell_latlon(self) -> tuple[np.ndarray, np.ndarray]:
        """(lat, lon) in radians, each (6, n, n); lon in [0, 2pi)."""
        p = self.cell_xyz
        lat = np.arcsin(np.clip(p[..., 2], -1.0, 1.0))
        lon = np.mod(np.arctan2(p[..., 1], p[..., 0]), 2.0 * np.pi)
        return lat, lon

    @functools.cached_property
    def cell_areas(self) -> np.ndarray:
        """(6, n, n) exact spherical cell solid angles; sums to 4*pi.

        Closed form for the solid angle of a gnomonic rectangle; identical on
        all faces, so computed once and broadcast.
        """
        edges = np.tan(
            -_QUARTER_PI + np.arange(self.n + 1) * (np.pi / 2.0) / self.n
        )
        xi1, eta1 = np.meshgrid(edges[:-1], edges[:-1], indexing="xy")
        xi2, eta2 = np.meshgrid(edges[1:], edges[1:], indexing="xy")
        area = (
            _solid_angle_antiderivative(xi2, eta2)
            - _solid_angle_antiderivative(xi1, eta2)
            - _solid_angle_antiderivative(xi2, eta1)
            + _solid_angle_antiderivative(xi1, eta1)
        )
        return np.broadcast_to(area, (6, self.n, self.n)).copy()

    @functools.cached_property
    def area_weights(self) -> np.ndarray:
        """(6, n, n) cell areas normalized to mean 1 (for weighted losses)."""
        a = self.cell_areas
        return a / a.mean()

    def __repr__(self) -> str:  # pragma: no cover
        return f"CubedSphere(n={self.n})"
