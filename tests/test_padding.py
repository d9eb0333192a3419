"""Halo-padding correctness: independent geometric oracles (SURVEY.md §4.1).

The key oracle never consults the padding code's own tables: for each ghost
cell we compute its *virtual center* (the equiangular coordinate continued
beyond the face boundary), project to 3D, find the nearest cell center on the
whole grid by dot product, and demand the padded value equals the field value
of exactly that cell.  An orientation or indexing bug anywhere produces O(1)
mismatches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.geometry import CubedSphere, face_xyz
from dlwp_cs_tpu.ops import cs_pad


def _virtual_center(face, edge, depth, t, n):
    """3D unit position of ghost cell (depth, t) beyond ``edge`` of ``face``."""
    step = (np.pi / 2) / n
    centers = -np.pi / 4 + (np.arange(n) + 0.5) * step
    out_ang = np.pi / 4 + (depth + 0.5) * step
    if edge == 0:  # S
        a, b = centers[t], -out_ang
    elif edge == 1:  # N
        a, b = centers[t], out_ang
    elif edge == 2:  # W
        a, b = -out_ang, centers[t]
    else:  # E
        a, b = out_ang, centers[t]
    p = face_xyz(face, np.tan(a), np.tan(b))
    return p / np.linalg.norm(p)


def _ghost_value(padded, f, e, d, t, n, w):
    if e == 0:
        return padded[f, w - 1 - d, w + t]
    if e == 1:
        return padded[f, w + n + d, w + t]
    if e == 2:
        return padded[f, w + t, w - 1 - d]
    return padded[f, w + t, w + n + d]


@pytest.mark.parametrize("n,width", [(8, 1), (8, 2), (12, 3)])
def test_ghost_cells_match_nearest_neighbor_oracle(n, width):
    """Depth-0 ghosts must equal the geometrically-nearest neighbor cell.

    For depth >= 1 the cube-padding copy is *topological* (index-wise), not
    nearest-cell (misalignment grows with depth), so deeper layers are checked
    by extending the depth-0 matches one cell further into the source face.
    """
    cs = CubedSphere(n)
    centers = cs.cell_xyz.reshape(-1, 3)
    # Distinct-valued field so equality identifies the exact source cell.
    field = np.arange(6 * n * n, dtype=np.float64).reshape(6, n, n)
    x = jnp.asarray(field)[None, :, :, :, None]  # (1, 6, n, n, 1)
    padded = np.asarray(cs_pad(x, width))[0, :, :, :, 0]
    w = width
    # Middle third of each edge, where depth-0 nearest-cell matching is
    # unambiguous.
    t_lo, t_hi = n // 3, 2 * n // 3
    checked = 0
    for f in range(6):
        for e in range(4):
            # Depth 0: pure geometry oracle; record source cells.
            sources = {}
            for t in range(t_lo, t_hi):
                p = _virtual_center(f, e, 0, t, n)
                src = np.argmax(centers @ p)
                expect = field.reshape(-1)[src]
                got = _ghost_value(padded, f, e, 0, t, n, w)
                assert got == expect, (f, e, 0, t)
                sources[t] = np.unravel_index(src, (n, n, n))[0], *np.unravel_index(
                    src, (n, n, n)
                )[1:]
                checked += 1
            # Which boundary of the source face do the depth-0 cells hug,
            # and thus which index steps "one cell deeper"?
            g, i0, j0 = sources[t_lo]
            if all(sources[t][1] == 0 for t in sources):
                deeper = lambda i, j, d: (i + d, j)
            elif all(sources[t][1] == n - 1 for t in sources):
                deeper = lambda i, j, d: (i - d, j)
            elif all(sources[t][2] == 0 for t in sources):
                deeper = lambda i, j, d: (i, j + d)
            else:
                assert all(sources[t][2] == n - 1 for t in sources), (f, e)
                deeper = lambda i, j, d: (i, j - d)
            for d in range(1, w):
                for t in range(t_lo, t_hi):
                    g, i, j = sources[t]
                    di, dj = deeper(i, j, d)
                    expect = field[g, di, dj]
                    got = _ghost_value(padded, f, e, d, t, n, w)
                    assert got == expect, (f, e, d, t)
                    checked += 1
    assert checked == 6 * 4 * w * (t_hi - t_lo)


def test_interior_untouched_and_shape():
    n, w = 6, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, n, n, 3)))
    p = cs_pad(x, w)
    assert p.shape == (2, 6, n + 2 * w, n + 2 * w, 3)
    np.testing.assert_array_equal(np.asarray(p[:, :, w:-w, w:-w, :]), np.asarray(x))


def test_constant_field_stays_constant():
    # Constants must survive padding exactly — including all corner blocks.
    n, w = 8, 2
    x = jnp.full((1, 6, n, n, 2), 3.25)
    p = np.asarray(cs_pad(x, w))
    assert np.all(p == 3.25)


def test_smooth_field_convergence():
    # Ghost values approximate the true field at virtual ghost centers with
    # O(h) error (neighbor-copy misalignment); halving h halves the error.
    def smooth(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        return x * y + 0.5 * z * z - 0.3 * y * z

    errs = {}
    for n in (16, 32):
        cs = CubedSphere(n)
        field = smooth(cs.cell_xyz)
        padded = np.asarray(cs_pad(jnp.asarray(field)[None, ..., None], 1))[
            0, :, :, :, 0
        ]
        worst = 0.0
        for f in range(6):
            for e in range(4):
                for t in range(n):
                    p = _virtual_center(f, e, 0, t, n)
                    truth = smooth(p)
                    if e == 0:
                        got = padded[f, 0, 1 + t]
                    elif e == 1:
                        got = padded[f, n + 1, 1 + t]
                    elif e == 2:
                        got = padded[f, 1 + t, 0]
                    else:
                        got = padded[f, 1 + t, n + 1]
                    worst = max(worst, abs(got - truth))
        errs[n] = worst
    assert errs[32] < 0.7 * errs[16]
    assert errs[16] < 0.2  # absolute sanity for an O(1) field


def test_linearity_and_grad():
    n = 6
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, n, n, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 6, n, n, 1)).astype(np.float32))
    a, b = 2.0, -0.5
    lhs = cs_pad(a * x + b * y, 1)
    rhs = a * cs_pad(x, 1) + b * cs_pad(y, 1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
    # grad flows and is the transpose of a linear map: grad of sum(pad(x))
    # counts how often each cell is read; interior cells are read exactly once.
    g = jax.grad(lambda v: jnp.sum(cs_pad(v, 1)))(x)
    g = np.asarray(g)[0, :, :, :, 0]
    assert np.allclose(g[:, 2:-2, 2:-2], 1.0)
    # edge cells are read by their own face and at least one neighbor
    assert (g[:, 0, 2:-2] >= 2.0 - 1e-6).all()


def test_bad_inputs():
    x = jnp.zeros((1, 6, 8, 8, 1))
    with pytest.raises(ValueError):
        cs_pad(x, 0)
    with pytest.raises(ValueError):
        cs_pad(x, 9)
    with pytest.raises(ValueError):
        cs_pad(jnp.zeros((1, 5, 8, 8, 1)), 1)
    with pytest.raises(ValueError):
        cs_pad(jnp.zeros((1, 6, 8, 4, 1)), 1)
