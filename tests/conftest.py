"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Multi-chip TPU hardware is unavailable in dev; distributed tests run on a
virtual CPU mesh (XLA host-platform device count), which exercises the same
sharding + collective code paths jit would run on a pod slice.
"""

import os

# NOTE: this image's sitecustomize registers the axon TPU plugin in every
# process and pins JAX_PLATFORMS=axon, so a plain env setdefault is not
# enough — force the CPU backend through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---- slow-test gating (default `pytest -q` stays under ~5 min) --------
# The full suite (280 tests) costs ~22 min on this 4-core box, dominated
# by device-setup parity sweeps and CNN-backbone forwards. Those stay in
# the suite behind `--runslow` (they are the pre-TPU-run gate); the
# default selection keeps at least one fast representative per surface.

SLOW_TESTS = {
    "test_boxmg.py": ("TestCoarseLevelKernelGeometry", "TestDeviceSetup",
                      "TestThetaSensitivity", "TestDIATransfers"),
    "test_ann.py": ("TestBackbones",),
    "test_block_mg.py": ("TestBlockDeviceSetup", "TestBlockSolve",
                         "TestBlockPallas", "TestBlockStencil"),
    "test_fused_tail.py": ("TestFusedTailKernel",),
    "test_pipeline.py": ("test_structured_sweep_rows",
                         "test_structured_sweep_rows_tc3", "TestDatagen"),
    "test_dist.py": ("TestDistStructured",),
    "test_entry_bench.py": ("TestBench", "TestGraftEntry"),
    "test_structured_mg.py": ("TestHigherDegree", "test_fem_q1_matrix",
                              "test_ir_solve_equilibrated_jumping"
                              "_coefficients", "test_poisson_convergence"),
    "test_batched.py": ("TestAMGSolveBatched",),
    "test_ann_driver.py": ("test_run_hyperparameter_csv",
                           "test_load_data_joins"),
    "test_analysis.py": ("test_feature_maps",),
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run the full suite incl. slow parity sweeps")


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running parity/device-setup test")


def pytest_collection_modifyitems(config, items):
    run_slow = config.getoption("--runslow")
    skip = pytest.mark.skip(reason="slow; pass --runslow for the full gate")
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        marks = SLOW_TESTS.get(fname, ())
        node = item.nodeid
        if any(m in node for m in marks) or "slow" in item.keywords:
            item.add_marker(pytest.mark.slow)
            if not run_slow:
                item.add_marker(skip)
