"""Native binary OP2 reader/writer (graph/op2.py).

Real-binary ingestion without pyNastran: FEAResults -> write_op2 ->
FORTRAN-record stream -> read_op2 -> extract_op2_results must reproduce
every field, and the graph built from the parsed results must be
IDENTICAL to the graph built from the in-memory results (the boundary
GraphCreate.py:55-110 crosses). Framing corruption and foreign tables
are covered explicitly.
"""

import struct

import numpy as np
import pytest

from buckgnn_tpu.datagen.shapes import generate_shape_mesh
from buckgnn_tpu.graph.build import build_graph
from buckgnn_tpu.graph.mesh import extract_op2_results, read_op2_results
from buckgnn_tpu.graph.op2 import read_op2, write_op2
from buckgnn_tpu.graph.synthetic import fake_fea


def _has_pynastran():
    try:
        import pyNastran  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="module")
def mesh_and_fea():
    mesh = generate_shape_mesh(seed=11)
    fea = fake_fea(mesh, 11)
    # distinct per-node stresses: the reference's triplet dedup
    # (make_unique_groups, GraphCreate.py:891-906) keys on VALUES, so
    # value-identical groups (fake_fea emits zeros) would collapse
    rng = np.random.default_rng(5)
    fea.gp_stresses = rng.normal(size=(mesh.n_node, 3)).astype(np.float32)
    # a couple of CBAR axial stresses so the OES1X1 table is non-empty
    if not fea.cbar_axial and mesh.cbar_ids is not None:
        fea.cbar_axial = {int(e): float(rng.normal())
                          for e in np.asarray(mesh.cbar_ids)[:3]}
    return mesh, fea


def _write(fea, mesh, path):
    write_op2(
        str(path),
        mesh.node_ids,
        eigenvalue=fea.eigenvalue,
        mode_shape=fea.mode_shape,
        static_displacements=fea.static_displacements,
        gp_stresses=fea.gp_stresses,
        gp_forces=fea.gp_forces,
        cbar_axial=fea.cbar_axial,
    )


def test_op2_roundtrip_fields(mesh_and_fea, tmp_path):
    mesh, fea = mesh_and_fea
    p = tmp_path / "case.op2"
    _write(fea, mesh, p)
    res = extract_op2_results(read_op2(str(p)))
    assert res.eigenvalue == pytest.approx(fea.eigenvalue, rel=1e-6)
    np.testing.assert_allclose(res.mode_shape[:, :3],
                               np.asarray(fea.mode_shape)[:, :3], rtol=1e-6)
    np.testing.assert_allclose(
        res.static_displacements[:, :2],
        np.asarray(fea.static_displacements)[:, :2], rtol=1e-6)
    np.testing.assert_allclose(res.gp_stresses,
                               np.asarray(fea.gp_stresses)[:, :3], rtol=1e-6)
    assert set(res.cbar_axial) == set(fea.cbar_axial)
    for eid, v in fea.cbar_axial.items():
        assert res.cbar_axial[eid] == pytest.approx(v, rel=1e-6)
    assert set(res.gp_forces) == set(fea.gp_forces)
    for nid, per_elem in fea.gp_forces.items():
        assert set(res.gp_forces[nid]) == set(per_elem)
        for eid, vec in per_elem.items():
            np.testing.assert_allclose(
                res.gp_forces[nid][eid], np.asarray(vec)[:3], rtol=1e-6)


@pytest.mark.skipif(_has_pynastran(),
                    reason="pyNastran installed: read_op2_results uses it")
def test_read_op2_results_native_builds_identical_graph(mesh_and_fea,
                                                        tmp_path):
    """The public entry point parses the BINARY file via the native
    reader, and the resulting graph matches the in-memory FEAResults
    graph bitwise — the full real-data boundary executes."""
    mesh, fea = mesh_and_fea
    p = tmp_path / "case.op2"
    _write(fea, mesh, p)
    res = read_op2_results(str(p))
    g_bin = build_graph(mesh, res, seed=3, use_super_node=True)
    g_mem = build_graph(mesh, fea, seed=3, use_super_node=True)
    np.testing.assert_array_equal(g_bin.x, g_mem.x)
    np.testing.assert_array_equal(g_bin.edge_attr, g_mem.edge_attr)
    np.testing.assert_array_equal(g_bin.senders, g_mem.senders)
    np.testing.assert_allclose(np.asarray(g_bin.y), np.asarray(g_mem.y))


def test_op2_corrupt_framing_raises(tmp_path):
    p = tmp_path / "bogus.op2"
    p.write_bytes(b"not an op2 file at all..")
    with pytest.raises(ValueError):
        read_op2(str(p))
    # truncated record body
    p2 = tmp_path / "trunc.op2"
    p2.write_bytes(struct.pack("<i", 1000) + b"\0" * 10)
    with pytest.raises(ValueError):
        read_op2(str(p2))


def test_op2_skips_foreign_tables(mesh_and_fea, tmp_path):
    """Records from tables this subset does not consume (GEOM1 etc., as
    real Nastran runs emit) must be skipped, not crash the scan."""
    mesh, fea = mesh_and_fea
    p = tmp_path / "case.op2"
    _write(fea, mesh, p)
    blob = p.read_bytes()

    def rec(payload):
        return struct.pack("<i", len(payload)) + payload + struct.pack(
            "<i", len(payload))

    foreign = (rec(b"GEOM1   ") + rec(struct.pack("<i", -1))
               + rec(np.arange(64, dtype=np.int32).tobytes())
               + rec(struct.pack("<i", 0)))
    p2 = tmp_path / "extra.op2"
    p2.write_bytes(foreign + blob + foreign)
    res = extract_op2_results(read_op2(str(p2)))
    assert res.eigenvalue == pytest.approx(fea.eigenvalue, rel=1e-6)
