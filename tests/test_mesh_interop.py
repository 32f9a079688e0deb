"""Real-data interop: reference-format BDF parsing + OP2 extraction.

The reference's decks are pyNastran small-field fixed-format output
(Data_Generation/Data_Generation_v3.py:18-58 writes the SOL 105 header and
pyNastran emits 8-char-column bulk cards). `tests/fixtures/
reference_small_field.bdf` mirrors that format exactly (incl. embedded
Nastran exponents like `1.0+2` and multi-card SPC1); `read_bdf` must parse
it — this is the L2 entry point for real thesis data.

OP2 extraction (graph/mesh.py::extract_op2_results) is unit-tested against
a mock object with pyNastran's OP2 attribute layout; the real-reader path
runs when pyNastran is installed (import-skipped otherwise).
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from buckgnn_tpu.graph.build import build_graph
from buckgnn_tpu.graph.mesh import (
    extract_op2_results,
    read_bdf,
    read_op2_results,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_small_field.bdf")


def test_read_reference_small_field_bdf():
    mesh = read_bdf(FIXTURE)
    assert list(mesh.node_ids) == list(range(1, 10))
    # embedded exponent 1.0+2 == 100.0 (GRID 9 y-coordinate)
    np.testing.assert_allclose(mesh.coords[8], [101.0, 100.0, 0.0])
    np.testing.assert_allclose(mesh.coords[1], [50.5, 0.0, 0.0])
    assert mesh.quads.shape == (4, 4)
    # CQUAD4 1: grid ids 1,2,5,4 -> zero-based indices
    assert list(mesh.quads[0]) == [0, 1, 4, 3]
    assert mesh.cbars.shape == (2, 2)
    assert list(mesh.cbar_pids) == [900, 999]
    # SPC1 '123456' on grids 1, 4 (one card) and 7 (a second card)
    assert {i: c for i, c in mesh.spc_components.items()} == {
        0: "123456", 3: "123456", 6: "123456"
    }
    # FORCE: scale * direction vector; 7.5-1 == 0.75 embedded exponent
    np.testing.assert_allclose(mesh.forces[2], [100.0, 50.0, 0.0])
    np.testing.assert_allclose(mesh.forces[5], [2.5 * 0.75, 0.0, 0.0])


def test_reference_bdf_builds_graph():
    """The fixture must flow through the full L2 graph construction."""
    mesh = read_bdf(FIXTURE)
    n = len(mesh.node_ids)
    results = SimpleNamespace(
        eigenvalue=3.25,
        static_displacements=np.linspace(0, 1, n * 2).reshape(n, 2),
        mode_shape=None,
        gp_stresses=np.linspace(-1, 1, n * 3).reshape(n, 3),
        gp_forces=None,
        cbar_axial=None,
    )
    g = build_graph(mesh, results, use_virtual_edges=False, seed=0)
    assert g.x.shape == (n, 15)
    assert float(g.y.reshape(-1)[0]) == 3.25
    # both directions of every undirected edge
    und = {tuple(sorted(e)) for e in zip(g.senders, g.receivers)}
    assert g.senders.shape[0] == 2 * len(und)


def _mock_op2(n=6):
    """pyNastran-OP2-shaped mock (attribute layout of
    op2.eigenvectors/displacements/... result objects)."""
    rng = np.random.default_rng(0)
    modes = rng.normal(size=(1, n, 6))
    disp = rng.normal(size=(1, n, 6))
    # GP surface stresses come in triplets per node (z1/z2/mid);
    # make_unique_groups keeps the first row of each unique group
    gps_unique = rng.normal(size=(n, 8))
    gps = np.repeat(gps_unique, 3, axis=0)
    gps[1::3] += 0.001  # rows within a group differ like real output
    gps[2::3] += 0.002
    cbar = SimpleNamespace(
        element=np.array([101, 102]),
        data=rng.normal(size=(1, 2, 6)),
    )
    gpf = SimpleNamespace(
        element_names=[["QUAD4", "QUAD4", "BAR"]],
        node_element=[np.array([[1, 11], [2, 11], [1, 55]])],
        data=[rng.normal(size=(3, 6))],
    )
    return SimpleNamespace(
        eigenvectors={(1, 8): SimpleNamespace(eigrs=[12.5], data=modes)},
        displacements={1: SimpleNamespace(data=disp)},
        grid_point_surface_stresses={1: SimpleNamespace(data=gps[None])},
        cbar_stress={1: cbar},
        grid_point_forces={1: gpf},
    ), modes, disp, gps_unique, cbar, gpf


def test_extract_op2_results_mock():
    op2, modes, disp, gps_unique, cbar, gpf = _mock_op2()
    res = extract_op2_results(op2)
    assert res.eigenvalue == 12.5
    np.testing.assert_allclose(res.mode_shape, modes[0])
    np.testing.assert_allclose(res.static_displacements, disp[0])
    # triplet dedup keeps the first row of each group, stress columns 0:3
    np.testing.assert_allclose(res.gp_stresses, gps_unique[:, :3])
    # CBAR axial = data[0, i, 4]
    assert res.cbar_axial == {
        101: float(cbar.data[0, 0, 4]), 102: float(cbar.data[0, 1, 4])
    }
    # only QUAD4 rows land in gp_forces, keyed node -> {elem: force[:3]}
    assert set(res.gp_forces) == {1, 2}
    np.testing.assert_allclose(res.gp_forces[1][11], gpf.data[0][0][:3])
    assert 55 not in res.gp_forces.get(1, {})


def test_read_bdf_large_field_stripped_continuation(tmp_path):
    """GRID* decks whose writers strip trailing blanks before the
    continuation (common) must still column-align: the parent line is
    padded back to the 72-char data boundary before the continuation's
    fields are appended (ADVICE r3). Also covers a continuation chain of
    two lines, each stripped."""
    deck = tmp_path / "stripped.bdf"
    deck.write_text(
        "BEGIN BULK\n"
        # parent ends right after X1 — X2 field's trailing blanks gone
        "GRID*   " + "7".ljust(16) + "".ljust(16) + "12.5".ljust(16)
        + "-3.\n"
        + "*       " + "4.75\n"
        "GRID,8,,1.,2.,3.\n"
        "CQUAD4,1,1,7,8,7,8\n"
        "ENDDATA\n"
    )
    mesh = read_bdf(str(deck))
    i7 = list(mesh.node_ids).index(7)
    np.testing.assert_allclose(mesh.coords[i7], [12.5, -3.0, 4.75])


def test_read_op2_requires_pynastran(tmp_path):
    pytest.importorskip("pyNastran", reason="pyNastran not installed")
    # pyNastran present: reading a non-OP2 file must raise its own error,
    # proving the import path executes
    p = tmp_path / "bogus.op2"
    p.write_bytes(b"not an op2")
    with pytest.raises(Exception):
        read_op2_results(str(p))


def test_read_bdf_foreign_cards_skip_with_warning(tmp_path):
    """A HyperMesh-style deck carrying unsupported cards (CORD2R, SPCADD,
    PARAM, PLOAD4, LOAD, MAT8) must parse the supported set correctly and
    warn ONCE naming every skipped type — never a silent drop. Known
    datagen-emitted property/solution cards (MAT1/PSHELL/PBAR/EIGRL) are
    recognized no-ops. Large-field GRID* coordinates parse exactly."""
    import warnings

    # large-field GRID*: 8-char name + 16-char fields (ID, CP, X1, X2),
    # X3 on a '*' continuation — padded to the 72-char boundary as real
    # writers emit it
    grid2 = ("GRID*   " + "2".ljust(16) + "".ljust(16) + "100.".ljust(16)
             + "0.".ljust(16) + "\n" + "*       " + "0.".ljust(16) + "\n")
    deck = tmp_path / "foreign.bdf"
    deck.write_text(
        "SOL 105\n"
        "CEND\n"
        "SPC = 1\n"
        "SUBCASE 1\n"
        "  LOAD = 2\n"
        "BEGIN BULK\n"
        "PARAM,POST,-1\n"
        "CORD2R,5,,0.,0.,0.,0.,0.,1.,1.,0.,0.\n"
        "MAT1,1,76000.,,0.3\n"
        "MAT8,2,130000.,10000.,.3,5000.\n"
        "PSHELL,1,1,1.5\n"
        "PBAR,900,1,160.,21333.,85333.\n"
        "GRID,1,,0.,0.,0.\n"
        + grid2 +
        "GRID,3,,100.,100.,0.\n"
        "GRID,4,,0.,100.,0.\n"
        "CQUAD4,10,1,1,2,3,4\n"
        "SPCADD,100,1,2\n"
        "SPC1,1,123456,1,4\n"
        "LOAD,2,1.,1.,3\n"
        "PLOAD4,3,10,-0.1\n"
        "FORCE,2,2,,1.,1000.,0.,0.\n"
        "EIGRL,10,0.0,,1\n"
        "ENDDATA\n"
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mesh = read_bdf(str(deck))
    msgs = [str(w.message) for w in rec if issubclass(w.category, UserWarning)]
    assert len(msgs) == 1, msgs
    for card in ("CORD2R", "SPCADD", "PARAM", "PLOAD4", "LOAD", "MAT8"):
        assert card in msgs[0]
    for card in ("MAT1", "PSHELL", "EIGRL", "SOL", "SUBCASE"):
        assert card not in msgs[0]
    # supported content parsed exactly despite the foreign cards
    assert list(mesh.node_ids) == [1, 2, 3, 4]
    np.testing.assert_allclose(mesh.coords[1], [100.0, 0.0, 0.0])
    assert mesh.quads.tolist() == [[0, 1, 2, 3]]
    assert mesh.spc_components == {0: "123456", 3: "123456"}
    np.testing.assert_allclose(mesh.forces[1], [1000.0, 0.0, 0.0])


def test_read_bdf_malformed_supported_card_raises(tmp_path):
    """Corruption in a PARSED card type must fail loudly (ValueError), not
    silently truncate the mesh."""
    deck = tmp_path / "bad.bdf"
    deck.write_text(
        "BEGIN BULK\n"
        "GRID,1,,0.,0.,0.\n"
        "CQUAD4,10,1,1,TWO,3,4\n"
        "ENDDATA\n"
    )
    with pytest.raises(ValueError, match="CQUAD4"):
        read_bdf(str(deck))
