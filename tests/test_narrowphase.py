"""Narrowphase unit tests: hand-computed manifolds for every feature regime
(SURVEY.md §4.1 — normal, depth, 1-2 contact points per pair)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starframe_tpu.narrowphase import manifold_pair

MARGIN = 0.05
V = 8  # padded vertex buffer


def pad(verts):
    v = np.asarray(verts, np.float32).reshape(-1, 2)
    out = np.tile(v[0], (V, 1)).astype(np.float32)
    out[: len(v)] = v
    return jnp.asarray(out), len(v)


def mani(va, ra, vb, rb, margin=MARGIN):
    va, na = pad(va)
    vb, nb = pad(vb)
    n, wa, wb, sep, pm = manifold_pair(va, na, ra, vb, nb, rb, margin)
    return (
        np.asarray(n),
        np.asarray(wa),
        np.asarray(wb),
        np.asarray(sep),
        np.asarray(pm),
    )


def active_points(sep, pm):
    return [k for k in range(2) if pm[k]]


# -- circle-circle ------------------------------------------------------------


def test_circle_circle_overlap():
    n, wa, wb, sep, pm = mani([[0, 0]], 1.0, [[1.5, 0]], 1.0)
    assert pm[0] and not pm[1]
    np.testing.assert_allclose(n, [1, 0], atol=1e-6)
    np.testing.assert_allclose(sep[0], -0.5, atol=1e-6)
    np.testing.assert_allclose(wa[0], [1.0, 0.0], atol=1e-6)  # surface of A
    np.testing.assert_allclose(wb[0], [0.5, 0.0], atol=1e-6)  # surface of B


def test_circle_circle_separated_beyond_margin():
    n, wa, wb, sep, pm = mani([[0, 0]], 0.5, [[2.0, 0]], 0.5)
    assert not pm.any()


def test_circle_circle_speculative():
    n, wa, wb, sep, pm = mani([[0, 0]], 0.5, [[1.02, 0]], 0.5)
    assert pm[0]
    np.testing.assert_allclose(sep[0], 0.02, atol=1e-6)


def test_circle_circle_diagonal():
    n, wa, wb, sep, pm = mani([[0, 0]], 1.0, [[1.0, 1.0]], 0.5)
    d = np.sqrt(2)
    np.testing.assert_allclose(n, [1 / d, 1 / d], atol=1e-6)
    np.testing.assert_allclose(sep[0], d - 1.5, atol=1e-6)


# -- circle-box ---------------------------------------------------------------

BOX = [[1, 1], [-1, 1], [-1, -1], [1, -1]]  # CCW unit box (half-extent 1)


def test_circle_on_box_face():
    n, wa, wb, sep, pm = mani(BOX, 0.0, [[0.0, 1.3]], 0.5)
    assert pm[0] and not pm[1]
    np.testing.assert_allclose(n, [0, 1], atol=1e-5)
    np.testing.assert_allclose(sep[0], -0.2, atol=1e-5)
    np.testing.assert_allclose(wa[0], [0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(wb[0], [0.0, 0.8], atol=1e-5)


def test_circle_at_box_corner_vertex_region():
    c = np.array([1.5, 1.5])
    n, wa, wb, sep, pm = mani(BOX, 0.0, [c], 0.8)
    assert pm[0]
    d = np.sqrt(0.5)
    np.testing.assert_allclose(n, [1 / np.sqrt(2), 1 / np.sqrt(2)], atol=1e-5)
    np.testing.assert_allclose(sep[0], d - 0.8, atol=1e-5)
    np.testing.assert_allclose(wa[0], [1, 1], atol=1e-5)


def test_circle_center_inside_box_deep():
    n, wa, wb, sep, pm = mani(BOX, 0.0, [[0.0, 0.7]], 0.2)
    assert pm[0]
    # nearest face is +y: depth = dist from center to face + radius
    np.testing.assert_allclose(n, [0, 1], atol=1e-5)
    np.testing.assert_allclose(sep[0], -(0.3 + 0.2), atol=1e-5)


# -- box-box ------------------------------------------------------------------


def test_box_on_box_two_point_manifold():
    top = np.asarray(BOX) * 0.5 + [0.2, 1.45]  # overlaps 0.05 on +y face
    n, wa, wb, sep, pm = mani(BOX, 0.0, top, 0.0)
    assert pm[0] and pm[1], f"expected 2 points, pm={pm} sep={sep}"
    np.testing.assert_allclose(n, [0, 1], atol=1e-5)
    np.testing.assert_allclose(sep, [-0.05, -0.05], atol=1e-5)
    xs = sorted([wa[0][0], wa[1][0]])
    np.testing.assert_allclose(xs, [-0.3, 0.7], atol=1e-4)


def test_box_on_box_speculative_parallel_gap():
    top = np.asarray(BOX) * 0.5 + [0.0, 1.52]  # 0.02 gap
    n, wa, wb, sep, pm = mani(BOX, 0.0, top, 0.0)
    assert pm[0] and pm[1]
    np.testing.assert_allclose(sep, [0.02, 0.02], atol=1e-5)


def test_box_corner_on_box_single_point():
    tilted = []
    a = np.pi / 4
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    tilted = (np.asarray(BOX) * 0.5) @ rot.T + [0.0, 1.0 + 0.5 * np.sqrt(2) - 0.05]
    n, wa, wb, sep, pm = mani(BOX, 0.0, tilted, 0.0)
    pts = active_points(sep, pm)
    assert len(pts) >= 1
    np.testing.assert_allclose(n, [0, 1], atol=1e-3)
    np.testing.assert_allclose(min(sep[k] for k in pts), -0.05, atol=1e-4)


def test_boxes_separated_diagonally_no_contact():
    far = np.asarray(BOX) + [3.0, 3.0]
    n, wa, wb, sep, pm = mani(BOX, 0.0, far, 0.0)
    assert not pm.any()


# -- capsule cases -------------------------------------------------------------


def test_capsule_lying_on_box_face_two_points():
    cap = [[-1.0, 1.45], [1.0, 1.45]]  # segment above +y face, radius .5
    n, wa, wb, sep, pm = mani(BOX, 0.0, cap, 0.5)
    assert pm[0] and pm[1], f"{pm} {sep}"
    np.testing.assert_allclose(n, [0, 1], atol=1e-5)
    np.testing.assert_allclose(sep, [-0.05, -0.05], atol=1e-5)


def test_capsule_end_cap_on_face():
    cap = [[1.35, 1.35], [3.0, 1.35]]  # left cap just beyond top-right corner
    n, wa, wb, sep, pm = mani(BOX, 0.0, cap, 0.5)
    pts = active_points(sep, pm)
    assert len(pts) == 1
    # closest feature: box corner (1,1) to cap end (1.35,1.35)
    d = np.linalg.norm([0.35, 0.35])
    np.testing.assert_allclose(sep[pts[0]], d - 0.5, atol=1e-5)
    np.testing.assert_allclose(n, [1 / np.sqrt(2), 1 / np.sqrt(2)], atol=1e-4)


def test_capsule_capsule_crossed():
    c1 = [[-1, 0], [1, 0]]
    c2 = [[0, -1], [0, 1]]
    n, wa, wb, sep, pm = mani(c1, 0.2, c2, 0.2)
    pts = active_points(sep, pm)
    assert len(pts) >= 1
    np.testing.assert_allclose(min(sep[k] for k in pts), -0.4, atol=1e-5)


def test_capsule_capsule_parallel_two_points():
    c1 = [[-1, 0], [1, 0]]
    c2 = [[-0.5, 0.35], [1.5, 0.35]]
    n, wa, wb, sep, pm = mani(c1, 0.2, c2, 0.2)
    assert pm[0] and pm[1]
    np.testing.assert_allclose(np.abs(n[1]), 1.0, atol=1e-4)
    np.testing.assert_allclose(sep, [-0.05, -0.05], atol=1e-4)


# -- polygon (hexagon) --------------------------------------------------------


def test_hexagon_face_on_box():
    # verts at 0°,60°,...: edge normals at 30°+k*60° include straight down,
    # so this orientation already has a flat bottom face at y = -apothem
    ang = np.arange(6) * np.pi / 3
    hexa = np.stack([np.cos(ang), np.sin(ang)], -1)
    apo = np.cos(np.pi / 6)
    hexa = hexa + [0.0, 1.0 + apo - 0.03]
    n, wa, wb, sep, pm = mani(BOX, 0.0, hexa, 0.0)
    assert pm[0] and pm[1], f"{pm} {sep}"
    np.testing.assert_allclose(n, [0, 1], atol=1e-4)
    np.testing.assert_allclose(sep, [-0.03, -0.03], atol=1e-4)


def test_hexagon_vertex_on_box_single_point():
    # rotated 30°: a vertex points down -> single deepest contact
    ang = np.arange(6) * np.pi / 3 + np.pi / 6
    hexa = np.stack([np.cos(ang), np.sin(ang)], -1)
    hexa = hexa + [0.0, 2.0 - 0.05]
    n, wa, wb, sep, pm = mani(BOX, 0.0, hexa, 0.0)
    pts = active_points(sep, pm)
    assert len(pts) >= 1
    np.testing.assert_allclose(n, [0, 1], atol=1e-3)
    np.testing.assert_allclose(min(sep[k] for k in pts), -0.05, atol=1e-4)


# -- invariants ---------------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
def test_manifold_symmetry_and_separation_consistency(seed, rng):
    """normal·(wb-wa) == sep for all valid points, and swapping A/B flips
    the normal (within the reference-choice tie tolerance)."""
    r = np.random.default_rng(seed)
    for _ in range(50):
        na = int(r.integers(1, 6))
        nb = int(r.integers(1, 6))
        ra = float(r.uniform(0.05, 0.5)) if na < 3 else float(r.uniform(0, 0.3))
        rb = float(r.uniform(0.05, 0.5)) if nb < 3 else float(r.uniform(0, 0.3))

        def rand_shape(n):
            if n == 1:
                return r.normal(scale=1.0, size=(1, 2))
            if n == 2:
                return r.normal(scale=1.0, size=(2, 2))
            ang = np.sort(r.uniform(0, 2 * np.pi, n))
            rad = r.uniform(0.3, 1.0)
            return rad * np.stack([np.cos(ang), np.sin(ang)], -1)

        va = rand_shape(na) + r.normal(scale=0.8, size=2)
        vb = rand_shape(nb) + r.normal(scale=0.8, size=2)

        n, wa, wb, sep, pm = mani(va, ra, vb, rb)
        for k in range(2):
            if pm[k]:
                got = float(np.dot(wb[k] - wa[k], n))
                np.testing.assert_allclose(got, sep[k], atol=1e-4)
                assert np.isfinite(wa[k]).all() and np.isfinite(wb[k]).all()
        assert np.isfinite(n).all()
