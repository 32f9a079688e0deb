"""Experiment harvesting (utils/harvest.py) and visual-validation tooling
(utils/visualization.py)."""

import json
import os

import numpy as np

from buckgnn_tpu.graph.build import build_graph
from buckgnn_tpu.graph.synthetic import fake_fea, generate_dataset, generate_mesh
from buckgnn_tpu.utils.harvest import (
    MetricPlotter,
    extract_scalars,
    find_runs,
    harvest,
)
from buckgnn_tpu.utils.logging import MetricsWriter
from buckgnn_tpu.utils.visualization import (
    connectivity_stats,
    feature_table,
    get_edge_feature_names,
    get_feature_names,
    plot_graph,
    plot_transform_check,
    virtual_edge_report,
)


def _fake_run(root, run_id, lr):
    d = os.path.join(root, run_id)
    w = MetricsWriter(d)
    for epoch in range(5):
        w.add_scalar("Loss/train", 1.0 / (epoch + 1), epoch)
        w.add_scalar("MAPE/val", 10.0 - epoch, epoch)
    w.close()
    ckpt = os.path.join(d, "weights", "best")
    os.makedirs(ckpt, exist_ok=True)
    with open(os.path.join(ckpt, "train_config.json"), "w") as f:
        json.dump({"lr": lr, "hidden_channels": 16}, f)
    return d


def test_harvest_runs(tmp_path):
    root = str(tmp_path / "results")
    _fake_run(root, "run_a", 1e-2)
    _fake_run(root, "run_b", 1e-3)
    runs = find_runs(root)
    assert len(runs) == 2
    assert all(r["config"] is not None for r in runs)

    scalars = extract_scalars(runs[0]["run_dir"])
    assert set(scalars) == {"Loss/train", "MAPE/val"}
    assert scalars["Loss/train"].shape == (5, 2)

    out = str(tmp_path / "harvested")
    index = harvest(root, out)
    assert set(index) == {"run_a", "run_b"}
    assert os.path.exists(os.path.join(out, "metric_Loss_train.npz"))
    assert index["run_a"]["config"]["lr"] == 1e-2


def test_metric_plotter(tmp_path):
    root = str(tmp_path / "results")
    _fake_run(root, "run_a", 1e-2)
    _fake_run(root, "run_b", 1e-3)
    out = str(tmp_path / "harvested")
    harvest(root, out)
    p = MetricPlotter(out)
    curves = p.plot_curves("Loss/train", str(tmp_path / "curves.png"))
    box = p.plot_final_comparison("MAPE/val", str(tmp_path / "box.png"),
                                  last_k=3)
    assert os.path.getsize(curves) > 1000
    assert os.path.getsize(box) > 1000


def test_feature_names_match_build_graph_width():
    mesh = generate_mesh(seed=0, min_side=4, max_side=4,
                         with_stiffeners=True)
    res = fake_fea(mesh, seed=0)
    for kw in (
        dict(),
        dict(use_super_node=True, use_virtual_edges=False),
        dict(use_gp_forces=True),
        dict(use_rotations=True),
    ):
        g = build_graph(mesh, res, **kw)
        names = get_feature_names(
            "buckling",
            use_rotations=kw.get("use_rotations", False),
            use_gp_forces=kw.get("use_gp_forces", False),
            use_super_node=kw.get("use_super_node", False),
        )
        assert len(names) == g.x.shape[1], (kw, names)
    assert len(get_edge_feature_names()) == 5
    assert len(get_edge_feature_names(use_axial_stress=True)) == 6


def test_feature_table_and_plots(tmp_path):
    mesh = generate_mesh(seed=1, min_side=5, max_side=5)
    res = fake_fea(mesh, seed=1)
    g_orig = build_graph(mesh, res, transform=False, seed=1)
    g_trans = build_graph(mesh, res, transform=True, seed=1)
    table = feature_table(g_orig, g_trans, get_feature_names("buckling"))
    assert "X coord" in table and "Max |diff|" in table
    p1 = plot_graph(g_trans, str(tmp_path / "g.png"), color_feature=2)
    p2 = plot_transform_check(g_orig, g_trans, str(tmp_path / "cmp.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_virtual_edges_shrink_graph_distances():
    (g,) = generate_dataset(1, seed=5, min_side=10, max_side=10,
                            use_virtual_edges=True, use_super_node=False)
    report = virtual_edge_report(g)
    assert report["path_reduction"] > 0
    assert report["with_virtual"]["avg_shortest_path"] < \
        report["without_virtual"]["avg_shortest_path"]


def test_connectivity_stats_grid():
    (g,) = generate_dataset(1, seed=0, min_side=4, max_side=4,
                            use_virtual_edges=False, use_super_node=False)
    stats = connectivity_stats(g)
    assert stats["diameter"] >= 2
    assert stats["avg_shortest_path"] > 1
