"""Normalizer scaler math vs sklearn + dataset-walk semantics."""

import numpy as np
import pytest

from buckgnn_tpu.graph.normalizer import (
    DatasetNormalizer,
    RobustScaler,
    StandardScaler,
    normalize_dataset,
)
from buckgnn_tpu.graph.synthetic import generate_dataset


def test_robust_scaler_matches_sklearn():
    from sklearn.preprocessing import RobustScaler as SkRobust

    rng = np.random.default_rng(0)
    x = rng.lognormal(size=(500, 3))
    ours = RobustScaler().fit(x)
    theirs = SkRobust().fit(x)
    np.testing.assert_allclose(ours.center_, theirs.center_, rtol=1e-12)
    np.testing.assert_allclose(ours.scale_, theirs.scale_, rtol=1e-12)
    np.testing.assert_allclose(
        ours.transform(x), theirs.transform(x), rtol=1e-10
    )


def test_standard_scaler_matches_sklearn():
    from sklearn.preprocessing import StandardScaler as SkStd

    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 4)) * 7 + 3
    ours = StandardScaler().fit(x)
    theirs = SkStd().fit(x)
    np.testing.assert_allclose(ours.mean_, theirs.mean_, rtol=1e-12)
    np.testing.assert_allclose(ours.scale_, theirs.scale_, rtol=1e-12)


def test_zero_scale_guard():
    x = np.ones((10, 2))
    r = RobustScaler().fit(x)
    np.testing.assert_allclose(r.scale_, [1.0, 1.0])  # sklearn zero->1 rule
    s = StandardScaler().fit(x)
    np.testing.assert_allclose(s.scale_, [1.0, 1.0])


def test_normalize_dataset_walk():
    dataset = generate_dataset(6, seed=3)
    normed, nz = normalize_dataset(dataset)
    x0 = dataset[0].x
    n0 = normed[0].x
    # coords range-scaled (Normalizer.py:287-289)
    denom = np.maximum(nz.coord_max - nz.coord_min, 1e-8) / 2
    np.testing.assert_allclose(n0[:, :2], x0[:, :2] / denom, rtol=1e-5)
    # SPC untouched (GraphCreate.py:703)
    np.testing.assert_allclose(n0[:, 2], x0[:, 2])
    # boundary + stiffener untouched (GraphCreate.py:712)
    np.testing.assert_allclose(n0[:, 5:10], x0[:, 5:10])
    # eigenvalue roundtrip
    ev = float(dataset[0].y[0])
    np.testing.assert_allclose(
        nz.denormalize_eigenvalue(float(normed[0].y[0])), ev, rtol=1e-6
    )


def test_normalize_dataset_supernode_rows_zeroed():
    dataset = generate_dataset(
        4, seed=5, use_super_node=True, use_virtual_edges=False
    )
    normed, _ = normalize_dataset(dataset)
    for d in normed:
        assert d.supernode == d.n_node - 1
        row = d.x[d.supernode]
        assert row[-1] == 1.0
        np.testing.assert_allclose(row[:-1], 0.0)


def test_normalizer_save_load(tmp_path):
    dataset = generate_dataset(5, seed=7)
    _, nz = normalize_dataset(dataset)
    p = str(tmp_path / "norm.npz")
    nz.save(p)
    nz2 = DatasetNormalizer.load(p)
    np.testing.assert_allclose(
        nz.eigenvalue_scaler.center_, nz2.eigenvalue_scaler.center_
    )
    np.testing.assert_allclose(nz.coord_max, nz2.coord_max)
    ev = 3.7
    np.testing.assert_allclose(
        nz.normalize_eigenvalue(ev), nz2.normalize_eigenvalue(ev)
    )


def test_fixed_normalizer_reused():
    train = generate_dataset(5, seed=11)
    test = generate_dataset(3, seed=13)
    _, nz = normalize_dataset(train)
    normed_test, nz2 = normalize_dataset(test, normalizer=nz)
    assert nz2 is nz
    # normalizing test with train stats differs from self-fit stats
    self_normed, _ = normalize_dataset(test)
    assert not np.allclose(normed_test[0].y, self_normed[0].y)
