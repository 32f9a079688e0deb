"""Data generation (datagen/): organic shapes, loadcase sampling,
stiffener groups, acceptance policy, solver runner — all hermetic."""

import os
import stat
import textwrap

import numpy as np
import pytest

from buckgnn_tpu.datagen.loadcases import (
    LoadcaseConfig,
    LoadcaseType,
    activate_stiffener_group,
    classify_loadcase,
    generate_loadcase,
    generate_model_cases,
    should_accept_loadcase,
    stiffener_candidates,
    trace_outer_boundary,
)
from buckgnn_tpu.datagen.runner import (
    RunnerConfig,
    SolverRunner,
    find_orphan_nodes,
    fix_bdf_text,
)
from buckgnn_tpu.datagen.shapes import (
    ShapeConfig,
    bezier_chain,
    generate_boundary,
    generate_shape_mesh,
    polygon_contains,
)
from buckgnn_tpu.graph.build import build_graph, find_boundary_nodes
from buckgnn_tpu.graph.mesh import ACTIVE_STIFFENER_PID
from buckgnn_tpu.graph.synthetic import fake_fea, generate_mesh


# ------------------------------ shapes ------------------------------ #

def test_generate_shape_mesh_valid_quads():
    mesh = generate_shape_mesh(seed=0)
    assert mesh.n_node > 50
    assert len(mesh.quads) > 40
    # all quads positively oriented and non-degenerate
    c = mesh.coords[:, :2]
    v1 = c[mesh.quads[:, 1]] - c[mesh.quads[:, 0]]
    v2 = c[mesh.quads[:, 3]] - c[mesh.quads[:, 0]]
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    assert (cross > 0).all()
    # envelope within the configured size range (some tolerance for
    # snapping)
    span = c.max(axis=0) - c.min(axis=0)
    assert 500.0 < max(span) < 1100.0


def test_shape_mesh_statistical_variety():
    sizes = [generate_shape_mesh(seed=s).n_node for s in range(4)]
    assert len(set(sizes)) > 1, "shapes must differ across seeds"


def test_shape_mesh_feeds_graph_builder():
    mesh = generate_shape_mesh(seed=1)
    res = fake_fea(mesh, seed=1)
    g = build_graph(mesh, res, use_virtual_edges=True, seed=1)
    assert g.x.shape[1] == 15
    assert np.isfinite(g.x).all()
    assert g.n_edge > g.n_node  # both directions + virtuals


def test_cutouts_create_interior_boundary():
    cfg = ShapeConfig(with_cutouts=True, max_cutouts=2,
                      cutout_min_size=100.0, cutout_max_size=160.0)
    for seed in range(6):
        mesh = generate_shape_mesh(seed=seed, cfg=cfg)
        outer = trace_outer_boundary(mesh)
        all_boundary = find_boundary_nodes(mesh)
        if len(all_boundary) > len(outer):
            return  # found a shape whose cutout created an inner loop
    pytest.skip("no cutout survived placement in 6 seeds")


def test_polygon_contains_square():
    poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    pts = np.array([[1, 1], [3, 1], [-0.1, 1], [1, 2.5]])
    np.testing.assert_array_equal(
        polygon_contains(pts, poly), [True, False, False, False]
    )


def test_bezier_chain_closed_and_smooth():
    rng = np.random.default_rng(0)
    cfg = ShapeConfig()
    verts = generate_boundary(rng, cfg)
    poly = bezier_chain(verts, rng, cfg)
    assert len(poly) == len(verts) * cfg.samples_per_edge
    # consecutive sample spacing bounded (no wild jumps)
    d = np.linalg.norm(np.diff(np.vstack([poly, poly[:1]]), axis=0), axis=1)
    assert d.max() < 20 * np.median(d)


# ----------------------------- loadcases ----------------------------- #

def test_trace_outer_boundary_on_grid():
    mesh = generate_mesh(seed=0, min_side=5, max_side=5)
    outer = trace_outer_boundary(mesh)
    expected = find_boundary_nodes(mesh)
    assert sorted(outer.tolist()) == sorted(expected.tolist())


def test_generate_loadcase_properties():
    mesh = generate_mesh(seed=2, min_side=8, max_side=10)
    rng = np.random.default_rng(0)
    cfg = LoadcaseConfig()
    lc = generate_loadcase(mesh, rng, cfg)
    assert lc is not None
    boundary = set(trace_outer_boundary(mesh).tolist())
    assert set(lc.bc_nodes.tolist()) <= boundary
    for nodes, direction, mag in lc.load_lines:
        assert set(nodes.tolist()) <= boundary
        assert not (set(nodes.tolist()) & set(lc.bc_nodes.tolist()))
        np.testing.assert_allclose(np.linalg.norm(direction), 1.0)
        assert cfg.min_load <= mag <= cfg.max_load


def test_stiffener_candidates_include_diagonals():
    mesh = generate_mesh(seed=0, min_side=4, max_side=4)
    cand = stiffener_candidates(mesh)
    n_quads = len(mesh.quads)
    uniq_perimeter = len(np.unique(
        np.sort(np.concatenate([
            mesh.quads[:, [0, 1]], mesh.quads[:, [1, 2]],
            mesh.quads[:, [2, 3]], mesh.quads[:, [3, 0]],
        ]), axis=1), axis=0))
    assert len(cand) == uniq_perimeter + 2 * n_quads  # diagonals unique


def test_activate_stiffener_group_connected_runs():
    mesh = generate_mesh(seed=1, min_side=8, max_side=8)
    cand = stiffener_candidates(mesh)
    rng = np.random.default_rng(3)
    cfg = LoadcaseConfig(min_active_stiffeners=10, max_active_stiffeners=30)
    active = activate_stiffener_group(cand, mesh.coords[:, :2], rng, cfg)
    assert 10 <= active.sum() <= 30


def test_classify_loadcase_types():
    uni_comp = np.tile([-100.0, -1.0, 0.0], (10, 1))
    assert classify_loadcase(uni_comp) == LoadcaseType.COMPRESSION
    uni_ten = np.tile([100.0, 1.0, 0.0], (10, 1))
    assert classify_loadcase(uni_ten) == LoadcaseType.TENSION
    pure_shear = np.tile([0.0, 0.0, 50.0], (10, 1))
    assert classify_loadcase(pure_shear) == LoadcaseType.SHEAR


def test_acceptance_policy():
    rng = np.random.default_rng(0)
    cfg = LoadcaseConfig()
    assert should_accept_loadcase(LoadcaseType.COMPRESSION, 2.0, rng, cfg)
    assert not should_accept_loadcase(LoadcaseType.COMPRESSION, None, rng, cfg)
    # ratio in (3, 10]: accepted ~10% of the time
    hits = sum(
        should_accept_loadcase(LoadcaseType.COMPRESSION, 5.0, rng, cfg)
        for _ in range(2000)
    )
    assert 120 < hits < 280


def test_generate_model_cases_end_to_end():
    mesh = generate_mesh(seed=4, min_side=8, max_side=8)
    cfg = LoadcaseConfig(loadcases_per_model=3, min_active_stiffeners=5,
                         max_active_stiffeners=20)
    cases = generate_model_cases(
        mesh, lambda m: fake_fea(m, seed=0), seed=0, cfg=cfg
    )
    assert len(cases) >= 1
    for case in cases:
        assert case.spc_components  # BCs applied
        assert case.forces
        assert (case.cbar_pids == ACTIVE_STIFFENER_PID).sum() >= 5
        # accepted cases must survive graph building
        g = build_graph(case, fake_fea(case, seed=0))
        assert np.isfinite(g.x).all()


def test_shape_to_cases_full_pipeline():
    """L1 end to end: organic shape -> loadcases -> graphs."""
    mesh = generate_shape_mesh(seed=3)
    cfg = LoadcaseConfig(loadcases_per_model=2, generate_stiffeners=False)
    cases = generate_model_cases(
        mesh, lambda m: fake_fea(m, seed=1), seed=1, cfg=cfg
    )
    assert len(cases) >= 1
    g = build_graph(cases[0], fake_fea(cases[0], seed=1))
    assert g.x.shape[1] == 15 and np.isfinite(g.x).all()


# ------------------------------ runner ------------------------------ #

_BDF_WITH_ORPHAN = textwrap.dedent("""\
    SOL 105
    CEND
    BEGIN BULK
    GRID           1            0.0     0.0     0.0
    GRID           2          100.0     0.0     0.0
    GRID           3          100.0   100.0     0.0
    GRID           4            0.0   100.0     0.0
    GRID           9          999.0   999.0     0.0
    CQUAD4         1       1       1       2       3       4
    EIGRL          1                      10
    MAT1           4  70000.              .3
    ENDDATA
""")


def test_find_orphan_nodes():
    lines = _BDF_WITH_ORPHAN.splitlines(keepends=True)
    assert find_orphan_nodes(lines) == {9}


def test_fix_bdf_text():
    lines = _BDF_WITH_ORPHAN.splitlines(keepends=True)
    fixed, modified = fix_bdf_text(lines, eigrl_nd=1)
    assert modified
    text = "".join(fixed)
    assert "GRID           9" not in text
    assert "EIGRL          1     0.0" in text
    assert "MAT1           4  76000.              .3" in text


def test_solver_runner_with_stub(tmp_path):
    """Batch run against a stub 'solver' that writes an .op2."""
    stub = tmp_path / "fakesolver.sh"
    stub.write_text("#!/bin/sh\ncp \"$1\" \"${1%.bdf}.op2\"\n"
                    "touch \"${1%.bdf}.log\"\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    for i in range(3):
        (tmp_path / f"model_{i}.bdf").write_text(_BDF_WITH_ORPHAN)
    bad = tmp_path / "broken.bdf"
    bad.write_text(_BDF_WITH_ORPHAN)

    cfg = RunnerConfig(solver_cmd=f"{stub} {{bdf}}", max_workers=2)
    runner = SolverRunner(cfg)
    op2s = runner.process_directory(str(tmp_path))
    assert len(op2s) == 4
    for p in op2s:
        assert os.path.exists(p)
        assert not os.path.exists(os.path.splitext(p)[0] + ".log")
    # BDFs were repaired in place
    assert "GRID           9" not in (tmp_path / "model_0.bdf").read_text()


def test_solver_runner_records_failures(tmp_path):
    stub = tmp_path / "failsolver.sh"
    stub.write_text("#!/bin/sh\nexit 3\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    (tmp_path / "m.bdf").write_text(_BDF_WITH_ORPHAN)
    runner = SolverRunner(RunnerConfig(solver_cmd=f"{stub} {{bdf}}"))
    assert runner.process_directory(str(tmp_path)) == []
    assert len(runner.failures) == 1
