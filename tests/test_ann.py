"""ANN: architecture shapes, loss semantics, normalization parity, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amg_ann_tpu.ann import (
    ThetaCostModel, fit, load_model, mse_mvar, norm_view, predict,
    save_model, stack_channels,
)


def tiny_model(learn_err=True, vs=12):
    return ThetaCostModel(nparams=3, wide1=4, depth1=1, wide2=0, depth2=0,
                          bottleneck=8, wide3=16, depth3=1, learn_err=learn_err)


class TestModel:
    @pytest.mark.parametrize("learn_err,out_dim", [(True, 2), (False, 1)])
    def test_output_shapes(self, learn_err, out_dim):
        m = tiny_model(learn_err)
        view = jnp.zeros((5, 12, 12, 4))
        pvec = jnp.zeros((5, 3))
        variables = m.init(jax.random.PRNGKey(0), view, pvec)
        out = m.apply(variables, view, pvec)
        assert out.shape == (5, out_dim)

    def test_variance_head_nonnegative(self):
        m = tiny_model(True)
        view = jnp.asarray(np.random.default_rng(0).random((7, 12, 12, 4)),
                           dtype=jnp.float32)
        pvec = jnp.asarray(np.random.default_rng(1).random((7, 3)),
                           dtype=jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), view, pvec)
        out = m.apply(variables, view, pvec)
        assert np.all(np.asarray(out[:, 1]) >= 0)

    def test_mse_mvar_stop_gradient(self):
        """Variance-head error must not backprop into the mean head."""
        y_true = jnp.ones((4, 1))
        y_pred = jnp.concatenate([jnp.zeros((4, 1)), jnp.full((4, 1), 0.5)],
                                 axis=1)
        # d/d mean of mse_mvar = d/d mean of mse alone (stop_gradient kills
        # the variance term's dependence on the mean)
        g = jax.grad(lambda m: mse_mvar(
            y_true, jnp.concatenate([m, y_pred[:, 1:2]], axis=1)))(
            y_pred[:, 0:1])
        g_ref = jax.grad(lambda m: jnp.mean((y_true - m) ** 2))(
            y_pred[:, 0:1])
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref))


class TestNormalize:
    def test_pure_log_bounds(self, rng):
        m = (rng.random((8, 8)) - 0.3) * 100
        c = (rng.random((8, 8)) * 5).astype(int)
        out = norm_view(m, c, "pure_log")
        assert np.abs(out).max() <= 1.0 + 1e-15
        # sign preserved
        assert np.all(np.sign(out) == np.sign(m))

    def test_modes_match_reference_formulas(self, rng):
        m = (rng.random((6, 6)) - 0.5) * 10
        c = (rng.random((6, 6)) * 3).astype(int)
        np.testing.assert_allclose(norm_view(m, c, "pure"),
                                   m / np.abs(m).max())
        t = np.where(c > 0, m / c, 0.0)
        np.testing.assert_allclose(norm_view(m, c, "resc"),
                                   t / np.abs(t).max())
        np.testing.assert_allclose(norm_view(m, c, "mean"), t)
        np.testing.assert_allclose(norm_view(m, c, "gaussian"),
                                   (m - m.mean()) / m.std())
        np.testing.assert_allclose(norm_view(m, c, "dataset_pure", 42.0),
                                   m / 42.0)

    def test_stack_channels_sum_max_c(self, rng):
        s = rng.random((5, 5)) - 0.5
        pp = rng.random((5, 5))
        npv = rng.random((5, 5))
        c = (rng.random((5, 5)) * 4).astype(int)
        img = stack_channels(s, pp, npv, c, "sum+max+c", "pure_log")
        assert img.shape == (5, 5, 4)
        img2 = stack_channels(s, pp, npv, c, "max", "pure")
        assert img2.shape == (5, 5, 1)
        with pytest.raises(KeyError):
            stack_channels(s, pp, npv, c, "sum+max+c", "gaussian")


class TestTraining:
    def test_overfits_tiny_dataset(self):
        rng = np.random.default_rng(0)
        n, vs = 32, 12
        view = rng.random((n, vs, vs, 4)).astype(np.float32)
        pvec = rng.random((n, 3)).astype(np.float32)
        # target: a simple deterministic function of the inputs
        tgt = (view.mean(axis=(1, 2, 3)) + pvec[:, 0]).astype(np.float32)
        m = tiny_model(True, vs)
        res = fit(m, view, pvec, tgt, epochs=200, batch_size=16, lr=3e-3,
                  patience=10, seed=0)
        assert res.best_loss < 2e-3, res.best_loss
        pred = predict(m, res.best_params, view, pvec)
        assert pred.shape == (n, 2)

    def test_lr_plateau_reduces(self):
        rng = np.random.default_rng(1)
        view = rng.random((8, 12, 12, 4)).astype(np.float32)
        pvec = rng.random((8, 3)).astype(np.float32)
        tgt = np.zeros(8, dtype=np.float32)
        m = tiny_model(False)
        res = fit(m, view, pvec, tgt, epochs=40, batch_size=8, lr=1e-3,
                  patience=2, seed=0)
        lrs = [h["lr"] for h in res.history]
        assert lrs[-1] <= lrs[0]
        assert all("loss" in h and "mae" in h for h in res.history)

    def test_validation_split(self):
        rng = np.random.default_rng(2)
        view = rng.random((20, 12, 12, 4)).astype(np.float32)
        pvec = rng.random((20, 3)).astype(np.float32)
        tgt = rng.random(20).astype(np.float32)
        m = tiny_model(True)
        res = fit(m, view, pvec, tgt, epochs=2, batch_size=8,
                  validation_split=0.25, seed=0)
        assert "val_loss" in res.history[-1]

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        view = rng.random((4, 12, 12, 4)).astype(np.float32)
        pvec = rng.random((4, 3)).astype(np.float32)
        m = tiny_model(True)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(view),
                           jnp.asarray(pvec))
        save_model(str(tmp_path / "m"), m, variables["params"],
                   view_size=12, channels=4)
        m2, params2, spec = load_model(str(tmp_path / "m"))
        assert spec == {"view_size": 12, "channels": 4}
        out1 = m.apply(variables, view, pvec)
        out2 = m2.apply({"params": params2}, view, pvec)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_pretrain_fine_tune(self):
        """The reference's pretrain path: continue from an existing state."""
        rng = np.random.default_rng(4)
        view = rng.random((16, 12, 12, 4)).astype(np.float32)
        pvec = rng.random((16, 3)).astype(np.float32)
        tgt = view.mean(axis=(1, 2, 3)).astype(np.float32)
        m = tiny_model(True)
        r1 = fit(m, view, pvec, tgt, epochs=5, batch_size=8, seed=0)
        r2 = fit(m, view, pvec, tgt, epochs=5, batch_size=8, seed=0,
                 state=r1.state, lr=1e-4)
        assert r2.history[-1]["loss"] <= r1.history[0]["loss"]


class TestBackbones:
    """Alternative CNN backbones (reference CNN_MODEL_TABLE analog)."""

    @pytest.mark.parametrize("cnn", ["mobilenet", "mobilenetv2",
                                     "mobilenetv3small", "resnet50v2",
                                     "densenet121", "inceptionv3",
                                     "efficientnetb0", "efficientnetv2b0"])
    def test_forward_and_grad(self, cnn):
        import jax
        import optax
        from amg_ann_tpu.ann.models import ThetaCostModel, mse_mvar

        model = ThetaCostModel(nparams=3, cnn_type=cnn, learn_err=True)
        rng = jax.random.PRNGKey(0)
        view = jnp.ones((2, 75, 75, 4), dtype=jnp.float32)
        pvec = jnp.ones((2, 3), dtype=jnp.float32)
        variables = model.init(rng, view, pvec)
        out = model.apply(variables, view, pvec)
        assert out.shape == (2, 2)
        assert bool(jnp.all(jnp.isfinite(out)))
        assert bool(jnp.all(out[:, 1] >= 0))      # softplus variance head

        def loss_fn(params):
            pred = model.apply({"params": params}, view, pvec)
            return mse_mvar(jnp.zeros((2, 1)), pred)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_dropped_backbones_point_to_family(self):
        import jax
        from amg_ann_tpu.ann.models import ThetaCostModel

        model = ThetaCostModel(nparams=3, cnn_type="nasnetmobile")
        with pytest.raises(NotImplementedError, match="mobilenetv2"):
            model.init(jax.random.PRNGKey(0),
                       jnp.ones((1, 16, 16, 4)), jnp.ones((1, 3)))
