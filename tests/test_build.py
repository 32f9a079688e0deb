"""Graph construction: feature schema, boundary detection, determinism,
BDF roundtrip, canonical-frame invariance."""

import numpy as np
import pytest

from buckgnn_tpu.graph.build import build_graph, find_boundary_nodes
from buckgnn_tpu.graph.mesh import read_bdf, write_bdf
from buckgnn_tpu.graph.synthetic import fake_fea, generate_dataset, generate_mesh


def test_feature_schema_15_dims():
    """SURVEY §2.3: buckling, 2D, no supernode -> 15 node dims, 5 edge dims."""
    mesh = generate_mesh(0)
    res = fake_fea(mesh, 0)
    g = build_graph(mesh, res)
    assert g.x.shape[1] == 15
    assert g.edge_attr.shape[1] == 5
    assert g.y.shape == (1,)
    assert g.supernode == -1
    # both directions present
    assert g.senders.shape == g.receivers.shape
    pairs = set(zip(g.senders.tolist(), g.receivers.tolist()))
    assert all((r, s) in pairs for s, r in pairs)


def test_supernode_schema():
    mesh = generate_mesh(1)
    res = fake_fea(mesh, 1)
    g = build_graph(mesh, res, use_super_node=True, use_virtual_edges=False)
    assert g.x.shape[1] == 16  # +1 indicator
    assert g.supernode == mesh.n_node
    assert g.x[g.supernode, -1] == 1.0
    assert np.all(g.x[: mesh.n_node, -1] == 0.0)
    # supernode connected to every real node
    sup_edges = np.sum(g.senders == g.supernode)
    assert sup_edges == mesh.n_node


def test_virtual_edges_fraction_and_flag():
    mesh = generate_mesh(2)
    res = fake_fea(mesh, 2)
    g_without = build_graph(mesh, res, use_virtual_edges=False)
    g_with = build_graph(mesh, res, use_virtual_edges=True)
    n_real_und = g_without.n_edge // 2
    n_virtual_und = (g_with.n_edge - g_without.n_edge) // 2
    assert n_virtual_und == int(n_real_und * 0.1333)
    # virtual flag set on exactly the virtual edges
    assert int(np.sum(g_with.edge_attr[:, 4] == 1.0)) == 2 * n_virtual_und


def test_virtual_edges_deterministic():
    mesh = generate_mesh(3)
    res = fake_fea(mesh, 3)
    g1 = build_graph(mesh, res, seed=42)
    g2 = build_graph(mesh, res, seed=42)
    np.testing.assert_array_equal(g1.senders, g2.senders)
    g3 = build_graph(mesh, res, seed=43)
    assert not np.array_equal(g1.senders, g3.senders)


def test_boundary_nodes_grid():
    mesh = generate_mesh(4)
    b = set(find_boundary_nodes(mesh).tolist())
    # on a full quad grid the boundary is exactly the perimeter
    coords = mesh.coords[:, :2]
    # reconstruct grid dims from node count/quad count
    n = mesh.n_node
    nq = len(mesh.quads)
    # perimeter size = n - interior; interior nodes appear in 4 quads
    from collections import Counter

    cnt = Counter(mesh.quads.reshape(-1).tolist())
    interior = {i for i, c in cnt.items() if c == 4}
    expected = set(range(n)) - interior
    assert b == expected


def test_canonical_invariance_end_to_end(rng):
    """Same mesh, rigidly moved -> identical node features (the invariance
    the reference checks only visually, Transform_Check.py:428-529)."""
    mesh = generate_mesh(5)
    res = fake_fea(mesh, 5)
    g1 = build_graph(mesh, res, use_virtual_edges=False)

    a = 1.234
    rot = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    mesh2 = generate_mesh(5)
    mesh2.coords = mesh2.coords @ rot.T + np.array([77.0, -31.0, 0.0])
    # forces rotate with the structure
    mesh2.forces = {
        k: rot @ np.asarray(v, dtype=float) for k, v in mesh.forces.items()
    }
    res2 = fake_fea(mesh2, 5)
    # displacement/stress fields also rotate
    res2.static_displacements = res.static_displacements.copy()
    res2.static_displacements[:, :2] = res.static_displacements[:, :2] @ rot[:2, :2].T
    sx, sy, txy = res.gp_stresses.T
    c, s = np.cos(a), np.sin(a)
    # rotate the stress tensor by +a
    c2, s2 = np.cos(2 * a), np.sin(2 * a)
    res2.gp_stresses = np.stack(
        [
            (sx + sy) / 2 + (sx - sy) / 2 * c2 + txy * s2,
            (sx + sy) / 2 - (sx - sy) / 2 * c2 - txy * s2,
            -(sx - sy) / 2 * s2 + txy * c2,
        ],
        axis=1,
    )
    res2.eigenvalue = res.eigenvalue
    g2 = build_graph(mesh2, res2, use_virtual_edges=False)
    np.testing.assert_allclose(g1.x, g2.x, atol=1e-4)


def test_bdf_roundtrip(tmp_path):
    mesh = generate_mesh(6, with_stiffeners=True)
    p = str(tmp_path / "model.bdf")
    write_bdf(mesh, p)
    mesh2 = read_bdf(p)
    assert mesh2.n_node == mesh.n_node
    np.testing.assert_allclose(mesh2.coords, mesh.coords, rtol=1e-5)
    np.testing.assert_array_equal(np.sort(mesh2.quads, axis=1),
                                  np.sort(mesh.quads, axis=1))
    np.testing.assert_array_equal(mesh2.cbar_pids, mesh.cbar_pids)
    assert mesh2.spc_components == mesh.spc_components
    for k, v in mesh.forces.items():
        np.testing.assert_allclose(mesh2.forces[k], v, rtol=1e-5)


def test_stiffened_dataset_has_active_edges():
    ds = generate_dataset(8, seed=9, with_stiffeners=True)
    flags = np.concatenate([g.edge_attr[:, 0] for g in ds])
    assert np.any(flags == 1.0)  # some active stiffener edges
    assert np.any(flags == 0.01)


def test_static_prediction_targets():
    mesh = generate_mesh(7)
    res = fake_fea(mesh, 7)
    g = build_graph(mesh, res, prediction_type="static_disp",
                    use_virtual_edges=False)
    # node-level targets [n, 2 disp + 3 stress]; features exclude disp/stress
    assert g.y.shape == (mesh.n_node, 5)
    assert g.x.shape[1] == 10  # 15 - 2 disp - 3 stress


def test_mode_shape_targets():
    mesh = generate_mesh(8)
    res = fake_fea(mesh, 8)
    g = build_graph(mesh, res, prediction_type="mode_shape",
                    use_virtual_edges=False)
    assert g.y.shape == (mesh.n_node, 3)
    assert g.eigenvalue is not None
