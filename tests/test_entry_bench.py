"""Driver contracts: __graft_entry__ and bench.py + mixed-precision IR."""

import json
import subprocess
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, "/root/repo")


class TestIRSolve:
    def test_reaches_1e8_true_residual(self):
        from amg_ann_tpu.amg import AMGParams
        from amg_ann_tpu.fem import poisson_7pt
        from amg_ann_tpu.solvers import ir_solve

        n = 16
        a = poisson_7pt(n)
        b = a.matvec(np.random.default_rng(0).random(n**3))
        res = ir_solve(a, b, AMGParams(dtype=np.float32), rtol=1e-8)
        assert res.converged
        assert res.true_res <= 1e-8
        # f64 ground truth
        r = b - a.matvec(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) <= 2e-8
        # the hierarchy itself is f32 (fast path)
        assert res.hierarchy.device.levels[0].a.data.dtype == np.float32
        assert res.outer_iters <= 6


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestBench:
    def test_bench_prints_one_json_line(self):
        import os

        env = {**os.environ, "BENCH_N": "12", "BENCH_PLATFORM": "cpu"}
        proc = subprocess.run([sys.executable, "/root/repo/bench.py"],
                              capture_output=True, text=True, timeout=600,
                              env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
        assert len(lines) == 1, proc.stdout
        rec = json.loads(lines[0])
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in rec
        assert rec["converged"] is True
        assert rec["true_rel_res"] <= 1e-8
