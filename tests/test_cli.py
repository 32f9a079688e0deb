"""CLI (`python -m buckgnn_tpu`): every subcommand end-to-end on tiny
hermetic data, plus the folder-dataset loading layer it is built on."""

import json
import os

import numpy as np
import pytest

from buckgnn_tpu.cli import main
from buckgnn_tpu.config import DataConfig
from buckgnn_tpu.graph.folder import (
    load_fea_npz,
    load_folder_dataset,
    save_fea_npz,
)
from buckgnn_tpu.graph.mesh import write_bdf
from buckgnn_tpu.graph.synthetic import fake_fea, generate_mesh


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Small folder of (bdf, fea.npz) pairs via the datagen command."""
    d = tmp_path_factory.mktemp("cases")
    rc = main(["datagen", "--out-dir", str(d), "--n-models", "3",
               "--loadcases-per-model", "2", "--seed", "0"])
    assert rc == 0
    return str(d)


def test_fea_npz_roundtrip(tmp_path):
    mesh = generate_mesh(seed=0, min_side=4, max_side=4)
    res = fake_fea(mesh, seed=0)
    p = str(tmp_path / "r.fea.npz")
    save_fea_npz(res, p)
    back = load_fea_npz(p)
    assert back.eigenvalue == pytest.approx(res.eigenvalue)
    np.testing.assert_allclose(back.static_displacements,
                               res.static_displacements)
    np.testing.assert_allclose(back.gp_stresses, res.gp_stresses)


def test_load_folder_dataset_fit_and_apply(data_dir):
    ds, nz = load_folder_dataset(data_dir, data_cfg=DataConfig())
    assert len(ds) >= 2
    assert nz is not None
    # apply path: same folder with the fitted normalizer -> same features
    ds2, _ = load_folder_dataset(data_dir, normalizer=nz,
                                 data_cfg=DataConfig())
    np.testing.assert_allclose(ds[0].x, ds2[0].x, rtol=1e-6)
    # cache file was created and is used
    caches = [f for f in os.listdir(data_dir) if f.startswith("dataset_cache")]
    assert caches


def test_load_folder_quarantines_corrupt_pair(tmp_path):
    mesh = generate_mesh(seed=1, min_side=4, max_side=4)
    write_bdf(mesh, str(tmp_path / "good.bdf"))
    save_fea_npz(fake_fea(mesh, seed=1), str(tmp_path / "good.fea.npz"))
    # corrupt pair: results for a different node count
    other = generate_mesh(seed=2, min_side=6, max_side=6)
    write_bdf(mesh, str(tmp_path / "bad.bdf"))
    save_fea_npz(fake_fea(other, seed=2), str(tmp_path / "bad.fea.npz"))

    ds, _ = load_folder_dataset(str(tmp_path), use_cache=False, processes=1)
    assert len(ds) == 1
    qdir = tmp_path / "problematic_files"
    assert (qdir / "bad.bdf").exists()
    problems = json.loads((qdir / "problems.json").read_text())
    assert "mismatch" in problems[0]["reason"]


@pytest.fixture(scope="module")
def trained(data_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    rc = main([
        "train", "--data-dir", data_dir, "--output-dir", str(out),
        "--num-epochs", "3", "--hidden-channels", "16", "--num-layers", "2",
        "--batch-size", "4", "--lr", "1e-3",
    ])
    assert rc == 0
    # checkpoints are directories weights/{last,best} (train/checkpoint.py)
    ckpts = []
    for root, dirs, files in os.walk(out):
        if "state.msgpack" in files:
            ckpts.append(root)
    assert ckpts, f"no checkpoint under {out}"
    best = [c for c in ckpts if os.path.basename(c) == "best"]
    return (best or ckpts)[0], str(out)


def test_cli_train_and_infer(trained, data_dir, tmp_path, capsys):
    ckpt_path, _ = trained
    rc = main(["infer", "--model-path", ckpt_path, "--data-dir", data_dir,
               "--output-dir", str(tmp_path / "inf"), "--batch-size", "4"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert "MAPE" in res and np.isfinite(res["MAPE"])


def test_cli_timer(trained, data_dir, tmp_path, capsys):
    ckpt_path, _ = trained
    rc = main(["timer", "--model-path", ckpt_path, "--data-dir", data_dir,
               "--batch-size", "4",
               "--output-path", str(tmp_path / "timer.txt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["samples_per_s"] > 0


def test_cli_split(data_dir, tmp_path, capsys):
    rc = main(["split", "--data-dir", data_dir,
               "--out-dir", str(tmp_path / "splits"),
               "--lengths", "0.7", "0.3", "--n-bins", "3"])
    assert rc == 0
    assert (tmp_path / "splits" / "normalizer_cache.npz").exists()


def test_cli_flatten(data_dir, tmp_path, capsys):
    rc = main(["flatten", "--data-dir", data_dir,
               "--out-dir", str(tmp_path / "flat"),
               "--samples-per-bin", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < out["selected"] <= out["total"]
    assert (tmp_path / "flat" / "dataset_flattened.npz").exists()


def test_cli_tune_synthetic(tmp_path, capsys):
    rc = main([
        "tune", "--synthetic", "6", "--output-dir", str(tmp_path),
        "--grid", json.dumps({"lr": [1e-2, 1e-3]}),
        "--num-epochs", "2", "--hidden-channels", "8", "--num-layers", "2",
        "--batch-size", "3", "--grace-period", "1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_trials"] == 2
