"""Pipeline: sweep CSV schema, preprocessing math, split contracts, θ* search."""

import io

import numpy as np
import pandas as pd
import pytest

import jax

from amg_ann_tpu.ann import ThetaCostModel, create_state
from amg_ann_tpu.pipeline import (
    SweepConfig, best_theta, calc_rho, generate_dataset, get_summary_perf,
    interp1d_tgt, interp_rho, pred_theta, preprocess_data, run_config,
    split_train_validation_test,
)
from amg_ann_tpu.pipeline import test_model as run_test_model

APP = "testcase2-diffusion-structured"


@pytest.fixture(scope="module")
def sweep_csv(tmp_path_factory):
    """A real (tiny) sweep: 2 problems × 9 θ values."""
    out = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    configs = [
        SweepConfig(problem=dict(pattern_size=2, refinements=2, mode=3,
                                 epsv=tuple(rng.uniform(0, 3, 8))),
                    strong_threshold=(0.1, 0.91, 0.1),
                    rtol_mode=True, setting_name=f"cfg{i}")
        for i in range(2)
    ]
    times_csv = generate_dataset(configs, str(out))
    pool_csv = generate_dataset(configs, str(out), pooling_size=10)
    return times_csv, pool_csv, str(out)


class TestDatagen:
    def test_schema(self, sweep_csv):
        times_csv, pool_csv, _ = sweep_csv
        df = pd.read_csv(times_csv)
        expect = ("setting,dim,ndof,mesh_ref,degree,sol_id,sol_pattern_size,"
                  "epsv,mode,timestamp,theta,maxrowsum,symop,tol,"
                  "t_amg_setup,t_solve,niters,p_res").split(",")
        assert list(df.columns) == expect
        assert len(df) == 2 * 9  # 2 configs x 9 thetas
        assert df["ndof"].nunique() == 1 and df["dim"].unique() == [3]
        # p_res is a quoted comma-joined vector of niters+1 entries
        row = df.iloc[0]
        res = [float(x) for x in row["p_res"].split(",")]
        assert len(res) == row["niters"] + 1

    def test_pooling_schema(self, sweep_csv):
        _, pool_csv, _ = sweep_csv
        df = pd.read_csv(pool_csv)
        assert "view" in df.columns and "view_count" in df.columns
        row = df.iloc[0]
        assert row["view_size"] == 10
        v = [float(x) for x in row["view"].split(",")]
        assert len(v) == 100
        c = [int(x) for x in row["view_count"].split(",")]
        assert sum(c) > 0


class TestPreprocessMath:
    def test_calc_rho(self):
        res = np.array([1.0, 0.1, 0.01])
        rho = calc_rho(res)
        np.testing.assert_allclose(rho, [0.1, 0.1])
        assert calc_rho(np.array([5.0])) == [1.0]

    def test_interp_rho_exact_endpoint(self):
        res = np.array([1.0, 0.1, 0.01])
        i, rp, r = interp_rho(res, 0.01)
        assert i == 2 and rp == 0.01
        np.testing.assert_allclose(r, 0.1)

    def test_interp_rho_interpolated(self):
        res = np.array([1.0, 0.1, 0.01])
        i, rp, r = interp_rho(res, 0.05)
        assert 1 < i < 2
        # log-linear between iterations 1 and 2
        np.testing.assert_allclose(np.exp(np.log(0.05) / i), r)

    def test_preprocess_columns(self, sweep_csv):
        times_csv, _, _ = sweep_csv
        df = preprocess_data(times_csv, APP, window=7, order=3)
        for c in ("t", "tsg", "rho", "irho", "tn", "tnl", "tsgn", "tsgnl",
                  "rhon", "rhonl", "irhon", "irhonl"):
            assert c in df.columns, c
        # tnl in [0, 1] per group
        assert df["tnl"].min() >= -1e-12 and df["tnl"].max() <= 1 + 1e-12
        assert (df["t"] == df["t_solve"] + df["t_amg_setup"]).all()

    def test_best_theta(self):
        g = pd.DataFrame({"theta": [0.3, 0.5, 0.7], "t": [5.0, 10.0, 8.0]})
        out = best_theta(g)
        assert out["theta_opt"] == 0.3
        np.testing.assert_allclose(out["gain"], 0.5)

    def test_split_contracts(self, sweep_csv, tmp_path):
        times_csv, pool_csv, _ = sweep_csv
        df = preprocess_data(times_csv, APP, window=7, order=3)
        view_df = pd.read_csv(pool_csv)
        # make the two configs distinct problems for the split: use epsv col
        tr, te = split_train_validation_test(df, APP, view_df,
                                             str(tmp_path), test=0.5)
        assert len(tr) + len(te) == len(df)
        # problem-level: no epsv appears in both sets
        assert not (set(tr["epsv"]) & set(te["epsv"]))
        assert (tmp_path / "train" / "stats.csv.gz").exists()
        assert (tmp_path / "train" / "view.csv.gz").exists()


class TestEvaluate:
    def test_interp1d_endfill(self):
        df = pd.DataFrame({"theta": [0.1, 0.5, 0.9], "t": [1.0, 2.0, 3.0]})
        assert interp1d_tgt(df, 0.05, "t") == 1.0   # clamp left
        assert interp1d_tgt(df, 0.95, "t") == 3.0   # clamp right
        np.testing.assert_allclose(interp1d_tgt(df, 0.3, "t"), 1.5)

    def test_pred_theta_grid(self):
        """θ* search against a model with a known minimum."""
        model = ThetaCostModel(nparams=2, wide1=2, depth1=1, wide2=0,
                               depth2=0, bottleneck=2, wide3=4, depth3=1,
                               learn_err=False)
        state = create_state(model, jax.random.PRNGKey(0), (8, 8, 1))
        view = np.zeros((8, 8, 1), dtype=np.float32)
        theta, pred, sigma = pred_theta(
            model, state.params, view,
            {"log2ndof": 10.0, "theta": 0.5},
            {"N": 21, "lvls": 2})
        # reference semantics: predictions are clipped to [0,1], θ is not —
        # a level-2 grid around an endpoint may overshoot by delta/reduce
        assert 0.05 - 0.09 <= theta <= 0.95 + 0.09
        assert 0.0 <= pred <= 1.0 and sigma == 0.0

    def test_test_model_and_summary(self):
        """End-to-end perf metrics with a dummy model over synthetic curves."""
        model = ThetaCostModel(nparams=2, wide1=2, depth1=1, wide2=0,
                               depth2=0, bottleneck=2, wide3=4, depth3=1,
                               learn_err=True)
        state = create_state(model, jax.random.PRNGKey(0), (6, 6, 1))
        thetas = np.round(np.arange(0.1, 0.91, 0.1), 2)
        rows = []
        for pid in range(3):
            for th in thetas:
                rows.append({
                    "pid": pid, "theta": th,
                    "t": 10 + pid + 4 * (th - 0.3) ** 2,
                    "tnl": (th - 0.3) ** 2,
                    "log2ndof": 12.0,
                    "view_img": np.zeros((6, 6, 1), dtype=np.float32),
                })
        df = pd.DataFrame(rows)
        perf = run_test_model(model, state.params, df, join_on=["pid"],
                          tgt="tnl", inputs=["log2ndof", "theta"],
                          view_column="view_img",
                          config={"N": 11, "lvls": 1})
        assert len(perf) == 3
        assert {"perf", "perf_max", "theta_nn", "theta_argmin"} <= set(
            perf.columns)
        # oracle gain: t(0.5) = 10+pid+0.16, t_min = t(0.3)
        np.testing.assert_allclose(perf["theta_argmin"], 0.3)
        summary = get_summary_perf(perf)
        assert set(summary) == {"frac_good", "mean_gain", "medi_gain",
                                "perf_mean", "perf_medi", "lost_mean",
                                "lost_medi"}
        assert np.isfinite(summary["mean_gain"])
        # σ̄ = 0 rejects every prediction → all gains zero
        s0 = get_summary_perf(perf, sigma_bar=0.0)
        assert s0["mean_gain"] == 0.0


class TestMultiAppDatagen:
    def test_all_four_apps_produce_rows(self, tmp_path):
        from amg_ann_tpu.pipeline import (
            APP_TC1, APP_TC21, APP_TC3, generate_dataset,
        )

        cfgs = [
            SweepConfig(app=APP_TC1,
                        problem=dict(mesh="Cube", refinements=1, seed=0,
                                     max_diffusion=1.0, freq=np.pi / 2),
                        strong_threshold=(0.3, 0.61, 0.3), rtol_mode=True,
                        setting_name="t1"),
            SweepConfig(app=APP_TC3,
                        problem=dict(pattern_size=2, refinements=1, seed=0,
                                     max_young=1.0),
                        strong_threshold=(0.3, 0.61, 0.3),
                        aggressive_levels=2, rtol_mode=True,
                        setting_name="t3"),
            SweepConfig(app=APP_TC21,
                        problem=dict(num_ref=2, diffusion_exp=2.0,
                                     marked_point=(0.0, 0.0, 0.0)),
                        strong_threshold=(0.3, 0.61, 0.3), rtol_mode=True,
                        setting_name="t21"),
        ]
        for cfg in cfgs:
            out = tmp_path / cfg.app
            csv = generate_dataset([cfg], str(out))
            df = pd.read_csv(csv)
            assert len(df) == 2, cfg.app  # 2 theta values
            assert df["theta"].nunique() == 2
            if cfg.app == APP_TC3:
                assert "aggressive_lvls" in df.columns
                assert (df["aggressive_lvls"] == 2).all()
            if cfg.app == APP_TC1:
                assert "naggr" in df.columns and "mesh" in df.columns

    def test_tc21_eigen_mode(self, tmp_path):
        from amg_ann_tpu.pipeline import APP_TC21, generate_dataset

        cfg = SweepConfig(app=APP_TC21, solver_mode=0,
                          problem=dict(num_ref=2, diffusion_exp=3.0,
                                       marked_point=(0.0, 0.0, 0.0)),
                          setting_name="eig")
        csv = generate_dataset([cfg], str(tmp_path))
        df = pd.read_csv(csv)
        assert {"solver", "min", "max", "amin", "amax"} <= set(df.columns)
        assert len(df) >= 2
        # SPD matrix: all eigenvalue columns positive; solvers agree on max
        assert (df["min"] > 0).all()
        mx = df["max"].to_numpy()
        assert abs(mx[0] - mx[-1]) / mx[0] < 1e-4

    def test_config_generators(self):
        from amg_ann_tpu.pipeline import (
            tc1_configs, tc21_configs, tc2_configs, tc3_configs,
        )

        assert len(tc2_configs(n_seeds=2)) == 3 * 2
        assert len(tc1_configs(n_seeds=1)) == 3 * 1 * 2
        assert len(tc21_configs()) == 3 * 5 * 3
        assert len(tc3_configs()) == 2 * 1 * 2 * 2 * 2
        for c in tc3_configs():
            assert c.aggressive_levels == 2


def test_sweepconfig_from_json(tmp_path):
    import json

    cfg_path = tmp_path / "settings.json"
    json.dump({"app": "testcase2-diffusion-structured",
               "problem": {"pattern_size": 2, "refinements": 1, "mode": 1,
                           "epsv": [0.0, 1.0]},
               "strong_threshold": [0.2, 0.81, 0.3],
               "tol": 1e-6, "setting_name": "fromjson"},
              open(cfg_path, "w"))
    cfg = SweepConfig.from_json(str(cfg_path))
    assert cfg.strong_threshold == (0.2, 0.81, 0.3)
    assert cfg.problem["pattern_size"] == 2
    assert cfg.setting_name == "fromjson"


def test_plots_smoke(tmp_path):
    from amg_ann_tpu.pipeline.plots import (
        plot_perf_histogram, plot_pred_scatter, plot_view_gallery,
    )

    rng = np.random.default_rng(0)
    perf = pd.DataFrame({"perf": rng.normal(0.1, 0.1, 30),
                         "perf_max": rng.uniform(0.1, 0.4, 30)})
    plot_perf_histogram(perf, save_path=str(tmp_path / "h.png"))
    plot_pred_scatter(rng.random(40), rng.random(40), rng.random(40),
                      save_path=str(tmp_path / "s.png"))
    plot_view_gallery([rng.random((8, 8)) - 0.5 for _ in range(3)],
                      save_path=str(tmp_path / "g.png"))
    assert (tmp_path / "h.png").exists()
    assert (tmp_path / "s.png").exists()
    assert (tmp_path / "g.png").exists()


def test_freeze_masks_gradients():
    from amg_ann_tpu.ann import fit

    rng = np.random.default_rng(0)
    view = rng.random((8, 8, 8, 1)).astype(np.float32)
    pvec = rng.random((8, 2)).astype(np.float32)
    tgt = rng.random(8).astype(np.float32)
    m = ThetaCostModel(nparams=2, wide1=2, depth1=1, wide2=0, depth2=0,
                       bottleneck=2, wide3=4, depth3=1, learn_err=False)
    import jax

    state = create_state(m, jax.random.PRNGKey(0), (8, 8, 1))
    init = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    r = fit(m, view, pvec, tgt, epochs=3, batch_size=8, freeze=1, seed=0,
            state=state)
    names = sorted(init.keys())
    frozen, trained = names[0], names[-1]
    assert all(np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(r.state.params[frozen]),
        jax.tree.leaves(init[frozen])))
    assert not all(np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(r.state.params[trained]),
        jax.tree.leaves(init[trained])))


def test_cli_generate_and_preprocess(tmp_path):
    """The two CLI subcommands end-to-end on a tiny tc2.1 grid."""
    from amg_ann_tpu.pipeline.cli import main as cli_main

    raw = tmp_path / "raw"
    cli_main(["generate", "--app", "tc21", "--out", str(raw), "--n", "2",
              "--threads", "2"])
    cli_main(["generate", "--app", "tc21", "--out", str(raw), "--n", "2",
              "--pooling", "8"])
    out = tmp_path / "processed"
    cli_main(["preprocess", "--app", "tc21", "--data", str(raw),
              "--out", str(out), "--pooling", "8", "--window", "5",
              "--order", "2", "--test", "0.5"])
    assert (out / "train" / "stats.csv.gz").exists()
    assert (out / "test" / "view.csv.gz").exists()


def test_structured_sweep_rows(tmp_path):
    """SweepConfig.structured: tc2 degree-1 sweeps run the θ-sensitive
    structured fast path and keep the exact tc2 CSV schema."""
    import pandas as pd

    from amg_ann_tpu.pipeline.datagen import APP_TC2, SweepConfig, run_config

    rng = np.random.default_rng(3)
    cfg = SweepConfig(
        app=APP_TC2,
        problem=dict(pattern_size=4, refinements=2, degree=1, mode=3,
                     epsv=rng.uniform(0, 4.0, 64)),
        tol=1e-6, structured=True, smoother="chebyshev",
        strong_threshold=(0.1, 0.91, 0.4), cycles=1)
    out = str(tmp_path / "stats.csv")
    run_config(cfg, out)
    df = pd.read_csv(out)
    assert len(df) == 3
    assert list(df.columns[:10]) == [
        "setting", "dim", "ndof", "mesh_ref", "degree", "sol_id",
        "sol_pattern_size", "epsv", "mode", "timestamp"]
    assert (df["niters"] > 0).all()
    assert (df["t_amg_setup"] > 0).all() and (df["t_solve"] > 0).all()
    res0 = [float(x) for x in df.iloc[0]["p_res"].strip('"').split(",")]
    assert len(res0) == df.iloc[0]["niters"] + 1
    assert res0[-1] / res0[0] <= 1e-6


def test_structured_sweep_rows_tc21(tmp_path):
    """tc2.1 degree-1 θ-sweeps (solver_mode 1) ride the structured fast
    path too, keeping the abbreviated tc2.1 schema (main.cpp:334-338)."""
    import pandas as pd

    from amg_ann_tpu.pipeline.datagen import (APP_TC21, SweepConfig,
                                              run_config)

    cfg = SweepConfig(
        app=APP_TC21,
        problem=dict(num_ref=3, diffusion_exp=4.0,
                     marked_point=(0.25, 0.25, 0.25)),
        tol=1e-6, structured=True, smoother="chebyshev",
        strong_threshold=(0.1, 0.91, 0.4), cycles=1)
    out = str(tmp_path / "stats.csv")
    run_config(cfg, out)
    df = pd.read_csv(out)
    assert len(df) == 3
    assert list(df.columns[:9]) == [
        "timestamp", "setting", "dim", "ndof", "mesh_ref", "degree",
        "renumbering", "diff", "mpt"]
    assert list(df.columns[9:]) == [
        "theta", "mrs", "sym", "agg_lvls", "tol", "t_setup", "t_solve",
        "it", "res"]
    assert (df["it"] > 0).all()
    res0 = [float(x) for x in df.iloc[0]["res"].strip('"').split(",")]
    assert res0[-1] / res0[0] <= 1e-6


def test_structured_sweep_rows_tc3(tmp_path):
    """tc3 degree-1 θ-sweeps ride the unknown-based BLOCK structured path
    (amg/boxmg_block.py) with the tc3 schema (aggressive_lvls column)."""
    import pandas as pd

    from amg_ann_tpu.pipeline.datagen import (APP_TC3, SweepConfig,
                                              run_config)

    cfg = SweepConfig(
        app=APP_TC3,
        problem=dict(pattern_size=2, refinements=1, degree=1, mode=3,
                     seed=0, max_young=2.0, sharp=False),
        tol=1e-6, structured=True, smoother="chebyshev",
        aggressive_levels=2,
        strong_threshold=(0.15, 0.76, 0.3), cycles=1)
    out = str(tmp_path / "stats.csv")
    run_config(cfg, out)
    df = pd.read_csv(out)
    assert len(df) == 3
    assert "aggressive_lvls" in df.columns
    assert (df["ndof"] == 3 * 5 ** 3).all()
    assert (df["niters"] > 0).all()
    res0 = [float(x) for x in df.iloc[0]["p_res"].strip('"').split(",")]
    assert res0[-1] / res0[0] <= 1e-6


class TestMvarWarmup:
    """Regression for the r4 mse_mvar epoch-0 runaway (VERDICT r5 item 1).

    Mechanism (see ann/train.create_state docstring): Adam early steps
    are ±lr sign-steps; the quartic variance term locks coherent
    gradient signs across the bottleneck fan-in once |error| > 1. A
    scaled-down provocation (smaller net, larger lr to compensate for
    the smaller fan-in) diverges without warmup and trains with it."""

    @staticmethod
    def _data(n=96, vs=12, seed=0):
        rng = np.random.default_rng(seed)
        view = rng.random((n, vs, vs, 2), dtype=np.float32)
        pvec = rng.random((n, 2)).astype(np.float32)
        tgt = rng.random(n).astype(np.float32)
        return view, pvec, tgt

    @staticmethod
    def _run(warmup_steps, lr=0.05, epochs=6, seed=0):
        from amg_ann_tpu.ann.train import create_state, make_train_step

        view, pvec, tgt = TestMvarWarmup._data()
        model = ThetaCostModel(nparams=2, wide1=4, depth1=1, wide2=0,
                               depth2=0, bottleneck=16, wide3=32, depth3=2,
                               learn_err=True)
        state = create_state(model, jax.random.PRNGKey(1), view.shape[1:],
                             lr, warmup_steps=warmup_steps)
        step = make_train_step(model)
        t = tgt.reshape(-1, 1)
        rng = np.random.default_rng(seed)
        worst = 0.0
        for _ in range(epochs):
            perm = rng.permutation(len(view))
            for s in range(0, len(view), 16):
                i = perm[s:s + 16]
                state, l, _ = step(state, view[i], pvec[i], t[i])
                worst = max(worst, float(l))
                if not np.isfinite(worst) or worst > 1e8:
                    return worst
        return worst

    def test_mvar_warmup_prevents_runaway(self):
        diverged = self._run(warmup_steps=0)
        assert diverged > 1e4, (
            "provocation no longer diverges without warmup — retune it "
            f"(worst loss {diverged:.3g})")
        stable = self._run(warmup_steps=100)
        assert stable < 1e3, f"warmup failed to stabilize: {stable:.3g}"

    def test_lr_plumbing_through_warmup_chain(self):
        """ReduceLROnPlateau pokes the injected lr through the chain."""
        from amg_ann_tpu.ann.train import _hyperparams, create_state

        model = ThetaCostModel(nparams=2, wide1=2, depth1=1, wide2=0,
                               depth2=0, bottleneck=2, wide3=4, depth3=1,
                               learn_err=True)
        state = create_state(model, jax.random.PRNGKey(0), (6, 6, 1), 1e-3)
        hp = _hyperparams(state.opt_state)
        assert float(hp["learning_rate"]) == pytest.approx(1e-3)
        import jax.numpy as jnp
        hp["learning_rate"] = jnp.asarray(5e-4)
        assert float(_hyperparams(state.opt_state)["learning_rate"]) \
            == pytest.approx(5e-4)
