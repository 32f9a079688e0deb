"""Canonicalization invariance + stress/stiffener transform oracles.

These are the 'golden' behaviors the reference validates only visually
(Utils/Transform_Check.py:428-529, Utils/PCA_Analysis_and_Visualization_Code
— SURVEY §4.1) turned into real assertions.
"""

import math

import numpy as np
import pytest

from buckgnn_tpu.graph.transform import (
    is_symmetric,
    mohr_transform,
    stiffener_bins,
    transform_diagonal_alignment,
    transform_pca,
    transform_to_simulation_coordinates,
)


def _asym_cloud(rng, n=60):
    pts = rng.uniform(0, 1, size=(n, 2)) * np.array([3.0, 1.0])
    pts[:, 0] = pts[:, 0] ** 1.5  # skew -> nonzero third moments
    return pts


@pytest.mark.parametrize("angle_deg", [0, 17, 90, 133, 245])
@pytest.mark.parametrize("reflect", [False, True])
def test_pca_canonicalization_se2_invariant(rng, angle_deg, reflect):
    pts = _asym_cloud(rng)
    canon0, _, _, info0 = transform_pca(pts)

    a = math.radians(angle_deg)
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    moved = pts @ rot.T + np.array([123.4, -55.0])
    if reflect:
        moved = moved * np.array([1.0, -1.0])
    canon1, _, _, info1 = transform_pca(moved)
    np.testing.assert_allclose(canon0, canon1, atol=1e-8)


def test_symmetric_square_uses_diagonal():
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert is_symmetric(sq)
    out, centroid, rot, info = transform_to_simulation_coordinates(sq)
    assert info is None  # diagonal branch returns no transform_info
    # tie-break picks pair (1, 3) like the reference's tuple sort; that
    # diagonal must land on the x-axis
    d = out[3] - out[1]
    assert abs(d[1]) < 1e-12
    np.testing.assert_allclose(abs(d[0]), np.sqrt(2.0))


def test_diagonal_alignment_matches_loop_oracle():
    """Compare against a literal (loop-based) re-statement of
    Transformation.py:97-147 (with the sign of the rotation corrected —
    see transform_diagonal_alignment's docstring)."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(12, 2))
    got, centroid, rotation, _ = transform_diagonal_alignment(pts)

    centered = pts - pts.mean(axis=0)
    dists = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dists.append((np.linalg.norm(centered[i] - centered[j]), i, j))
    dists.sort(reverse=True)
    _, p1, p2 = dists[0]
    diag = centered[p2] - centered[p1]
    ang = np.arctan2(diag[1], diag[0])
    c, s = np.cos(ang), np.sin(ang)
    want = centered @ np.array([[c, -s], [s, c]])
    np.testing.assert_allclose(got, want, atol=1e-12)
    # and the selected diagonal is on the x-axis
    d = got[p2] - got[p1]
    assert abs(d[1]) < 1e-9


def test_diagonal_alignment_rotation_invariant():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(10, 2))
    out0, *_ = transform_diagonal_alignment(pts)
    a = 0.7
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    out1, *_ = transform_diagonal_alignment(pts @ rot.T + 5.0)
    np.testing.assert_allclose(out0, out1, atol=1e-9)


def test_mohr_matches_reference_oracle():
    """Utils/Stress_Transformation.py:3-16 with its __main__ hand-check."""
    sx, sy, txy = 8.488, -4.23, -1.17
    angle = math.radians(-90.3)
    # feed via transform_info path: theta = -rotation_angle
    info = {"rotation_angle": -angle, "flip_x": False, "flip_y": False}
    out = mohr_transform(np.array([[sx, sy, txy]]), np.eye(2), info, True)
    c2, s2 = math.cos(2 * angle), math.sin(2 * angle)
    want_sx = (sx + sy) / 2 + (sx - sy) / 2 * c2 + txy * s2
    want_sy = (sx + sy) / 2 - (sx - sy) / 2 * c2 - txy * s2
    want_txy = -(sx - sy) / 2 * s2 + txy * c2
    np.testing.assert_allclose(out[0], [want_sx, want_sy, want_txy], atol=1e-12)


def test_mohr_single_flip_negates_shear():
    sig = np.array([[5.0, -2.0, 3.0]])
    base = mohr_transform(
        sig, np.eye(2), {"rotation_angle": 0.3, "flip_x": False, "flip_y": False}
    )
    flipped = mohr_transform(
        sig, np.eye(2), {"rotation_angle": 0.3, "flip_x": True, "flip_y": False}
    )
    both = mohr_transform(
        sig, np.eye(2), {"rotation_angle": 0.3, "flip_x": True, "flip_y": True}
    )
    np.testing.assert_allclose(flipped[0, :2], base[0, :2])
    np.testing.assert_allclose(flipped[0, 2], -base[0, 2])
    np.testing.assert_allclose(both, base)


def test_stiffener_bins_exact_and_split():
    node = np.zeros(2)
    # exactly horizontal -> bin 0 gets 1.0
    b = stiffener_bins(node, np.array([[10.0, 0.0]]), np.eye(2))
    np.testing.assert_allclose(b, [1, 0, 0, 0])
    # exactly 45 deg
    b = stiffener_bins(node, np.array([[1.0, 1.0]]), np.eye(2))
    np.testing.assert_allclose(b, [0, 1, 0, 0])
    # direction symmetry: 180 deg flip maps to the same bin
    b = stiffener_bins(node, np.array([[-1.0, -1.0]]), np.eye(2))
    np.testing.assert_allclose(b, [0, 1, 0, 0])
    # 22.5 deg -> split evenly between bins 0 and 45
    b = stiffener_bins(node, np.array([[np.cos(np.pi / 8), np.sin(np.pi / 8)]]),
                       np.eye(2))
    np.testing.assert_allclose(b, [0.5, 0.5, 0, 0], atol=1e-12)
    # 30 deg -> weights proportional to complementary distances (15/30, 30-..)
    b = stiffener_bins(node, np.array([[np.cos(np.pi / 6), np.sin(np.pi / 6)]]),
                       np.eye(2))
    np.testing.assert_allclose(b, [15 / 45, 30 / 45, 0, 0], atol=1e-12)


def test_stiffener_bins_rotated_frame():
    """Bins are computed in the transformed frame (Transformation.py:38)."""
    node = np.zeros(2)
    a = np.pi / 4
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    # a horizontal bar projected into a +45deg frame lies along -45deg,
    # i.e. the 135 bin
    b = stiffener_bins(node, np.array([[1.0, 0.0]]), rot)
    assert b[3] == pytest.approx(1.0)
    # and a +45deg bar in that frame is axis-aligned (bin 0)
    b = stiffener_bins(node, np.array([[1.0, 1.0]]), rot)
    assert b[0] == pytest.approx(1.0)
