"""C++ host-ETL kernels (cpp/native.cpp via utils/native.py): parity with
the NumPy paths and band-locality improvement from RCM reordering."""

import numpy as np
import pytest

from buckgnn_tpu.graph.batch import GraphData
from buckgnn_tpu.graph.build import rcm_reorder, shell_edges
from buckgnn_tpu.graph.mesh import MeshModel
from buckgnn_tpu.graph.synthetic import generate_mesh
from buckgnn_tpu.utils import native


def _numpy_shell_edges(mesh):
    pairs = []
    for conn in (mesh.quads, mesh.trias):
        if len(conn) == 0:
            continue
        k = conn.shape[1]
        for i in range(k):
            a, b = conn[:, i], conn[:, (i + 1) % k]
            pairs.append(
                np.stack([np.minimum(a, b), np.maximum(a, b)], axis=1)
            )
    allp = np.concatenate(pairs)
    return np.unique(allp, axis=0, return_counts=True)


def test_native_library_builds():
    assert native.available(), "g++ toolchain is baked in; build must work"


def test_shell_edges_native_matches_numpy():
    mesh = generate_mesh(seed=3, min_side=6, max_side=9)
    got_pairs, got_counts = native.shell_edges_native(mesh.quads, mesh.trias)
    exp_pairs, exp_counts = _numpy_shell_edges(mesh)
    np.testing.assert_array_equal(got_pairs, exp_pairs)
    np.testing.assert_array_equal(got_counts, exp_counts)


def test_shell_edges_build_path_uses_native():
    mesh = generate_mesh(seed=5, min_side=5, max_side=7)
    pairs, counts = shell_edges(mesh)
    exp_pairs, exp_counts = _numpy_shell_edges(mesh)
    np.testing.assert_array_equal(np.asarray(pairs), exp_pairs)
    np.testing.assert_array_equal(np.asarray(counts), exp_counts)


def test_rcm_is_permutation_and_matches_fallback_coverage():
    rng = np.random.default_rng(0)
    n = 200
    # path graph shuffled to a random labeling: RCM must recover near-
    # optimal bandwidth (exactly 1 for a path).
    relabel = rng.permutation(n)
    s = relabel[np.arange(n - 1)]
    r = relabel[np.arange(1, n)]
    for impl in ("native", "numpy"):
        if impl == "native":
            perm = native.rcm_order(n, s, r)
        else:
            perm = native._rcm_order_numpy(n, s, r)
        assert sorted(perm.tolist()) == list(range(n))
        pos = np.empty(n, dtype=np.int64)
        pos[perm] = np.arange(n)
        bw = int(np.max(np.abs(pos[s] - pos[r])))
        assert bw <= 2, f"{impl} RCM bandwidth {bw} on a path"


def test_band_fraction_improves_with_rcm():
    rng = np.random.default_rng(1)
    from buckgnn_tpu.graph.build import build_graph
    from buckgnn_tpu.graph.synthetic import fake_fea

    mesh = generate_mesh(seed=7, min_side=12, max_side=12)
    # scramble node order like an arbitrary-order BDF would
    perm = rng.permutation(mesh.n_node)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(mesh.n_node)
    scrambled = MeshModel(
        coords=mesh.coords[perm],
        node_ids=mesh.node_ids[perm],
        quads=inv[mesh.quads],
        quad_ids=mesh.quad_ids,
        trias=inv[mesh.trias] if len(mesh.trias) else mesh.trias,
        cbars=inv[mesh.cbars] if len(mesh.cbars) else mesh.cbars,
        cbar_ids=mesh.cbar_ids,
        cbar_pids=mesh.cbar_pids,
        spc_components={int(inv[k]): v for k, v in mesh.spc_components.items()},
        forces={int(inv[k]): v for k, v in mesh.forces.items()},
    )
    res = fake_fea(mesh, seed=7)
    res2 = type(res)(
        eigenvalue=res.eigenvalue,
        static_displacements=res.static_displacements[perm],
        gp_stresses=res.gp_stresses[perm],
        mode_shape=res.mode_shape[perm] if res.mode_shape is not None else None,
        gp_forces=res.gp_forces,
        cbar_axial=res.cbar_axial,
    )
    g = build_graph(scrambled, res2, use_virtual_edges=False)
    n = g.n_node
    ident = np.arange(n)
    frac_before = native.band_fraction(
        g.senders, g.receivers, ident, n, tile=64, width=32
    )
    g2 = rcm_reorder(g)
    frac_after = native.band_fraction(
        g2.senders, g2.receivers, ident, n, tile=64, width=32
    )
    assert frac_after > frac_before + 0.2
    assert frac_after > 0.9


def test_rcm_reorder_preserves_graph_semantics():
    from buckgnn_tpu.graph.synthetic import generate_dataset

    (g,) = generate_dataset(1, seed=11, min_side=6, max_side=6,
                            use_super_node=True, use_virtual_edges=False)
    g2 = rcm_reorder(g)
    # supernode still last, indicator column still correct
    assert g2.supernode == g.supernode == g.n_node - 1
    np.testing.assert_array_equal(g2.x[:, -1], g.x[:, -1])
    # degree sequence is permutation-invariant
    assert sorted(np.bincount(g.receivers, minlength=g.n_node).tolist()) == \
        sorted(np.bincount(g2.receivers, minlength=g2.n_node).tolist())
    # node feature multiset preserved
    a = np.sort(g.x.sum(axis=1))
    b = np.sort(g2.x.sum(axis=1))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # edges map to the same coordinate pairs: compare sorted edge-length sets
    def lengths(gr):
        xy = gr.x[:, :2]
        return np.sort(
            np.linalg.norm(xy[gr.senders] - xy[gr.receivers], axis=1)
        )

    np.testing.assert_allclose(lengths(g), lengths(g2), rtol=1e-5)
