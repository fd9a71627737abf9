"""End-to-end hyperparameter-CSV training driver (train_ann.main parity)."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from amg_ann_tpu.ann.driver import (
    find_metadata, load_data, run_hyperparameter_csv,
)
from amg_ann_tpu.pipeline import (
    SweepConfig, generate_dataset, preprocess_data,
    split_train_validation_test,
)

APP = "testcase2-diffusion-structured"


@pytest.fixture(scope="module")
def processed_dataset(tmp_path_factory):
    """Tiny real dataset through the full sweep→preprocess→split path."""
    out = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(3)
    configs = [
        SweepConfig(problem=dict(pattern_size=2, refinements=2, mode=3,
                                 epsv=tuple(rng.uniform(0, 3, 8))),
                    strong_threshold=(0.1, 0.91, 0.2),
                    rtol_mode=True, setting_name=f"c{i}")
        for i in range(4)
    ]
    times = generate_dataset(configs, str(out))
    pools = generate_dataset(configs, str(out), pooling_size=8)
    df = preprocess_data(times, APP, window=5, order=2)
    view_df = pd.read_csv(pools)
    split_train_validation_test(df, APP, view_df, str(out), test=0.25)
    return str(out)


def test_load_data_joins(processed_dataset):
    df = load_data(os.path.join(processed_dataset, "train"),
                   view_size=8,
                   join_on=["epsv"],
                   norm_mode="pure_log", view_type="sum+max+c")
    assert "img" in df.columns and "log2ndof" in df.columns
    assert df["img"].iloc[0].shape == (8, 8, 4)


def test_run_hyperparameter_csv(processed_dataset, tmp_path):
    meta = pd.DataFrame([{
        "cnn_type": "classic", "w1": 4, "d1": 1, "w2": 0, "d2": 0,
        "bn": 8, "w3": 16, "d3": 1, "kernel_size": 3, "act": "relu",
        "opt": "adam", "lr": 3e-3, "epochs": 4, "batch_size": 8,
        "patience": 3, "val_split": 0.0, "learn_err": 1,
        "view_size": 8, "view_type": "sum+max+c", "norm_mode": "pure_log",
        "inputs": "log2ndof;theta;degree", "tgt": "tnl",
        "join_on": "epsv",
    }])
    meta_path = tmp_path / "train_hyperparameters.csv"
    meta.to_csv(meta_path, index=False)
    outdir = tmp_path / "models"

    hyper = run_hyperparameter_csv(
        str(outdir), os.path.join(processed_dataset, "train"),
        str(meta_path))
    assert "name" in hyper.columns and hyper["mse"].notna().all()
    name = hyper.iloc[0]["name"]
    assert (outdir / name / "params.msgpack").exists()
    assert (outdir / name / "history.csv").exists()

    # metadata lookup round trip (model_evaluation.find_metadata parity)
    row = find_metadata(str(outdir), name)
    assert row["tgt"] == "tnl"

    # pretrain path: second row fine-tunes from the first model
    meta2 = meta.copy()
    meta2["pretrain"] = name
    meta2_path = tmp_path / "meta2.csv"
    meta2.to_csv(meta2_path, index=False)
    hyper2 = run_hyperparameter_csv(
        str(outdir), os.path.join(processed_dataset, "train"),
        str(meta2_path))
    assert hyper2.iloc[0]["name"] != name
