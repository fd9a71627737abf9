"""Benchmark: AMG-PCG on 3D Poisson (BASELINE.json config 1), real TPU.

Prints ONE JSON line:
  metric      sustained V-cycle + SpMV kernel throughput at FIXED work:
              a PCG loop forced to run exactly BENCH_FIXED_ITERS
              iterations (tol=rtol=0), nnz traversed per second.
  vs_baseline fraction of the single-chip HBM speed-of-light bound under
              the DIA-format-TRUE byte accounting (~7 B/nnz — see the
              roofline comment in main()); r1-r4 used a 12 B/nnz ELL
              accounting, kept as `vs_ell_roofline` for continuity
              (VERDICT r4 item 10: honest roofline).

Why fixed work (round-4 metric change): through round 3 the headline was
nnz/s through the CONVERGENT solve, so algorithmic improvements that cut
iteration counts (e.g. BoxMG interpolation, r3) reduced the measured
throughput while improving actual time-to-solution — the metric moved
opposite to progress. Fixing the iteration count makes the number a pure
kernel-pipeline measurement, monotone under convergence improvements.
Time-to-solution is still reported, separately:
  tts_s           wall seconds of one full solve to 1e-8 true residual
                  (mixed-precision iterative refinement: f32 AMG-PCG inner
                  sweeps + f64/double-single outer residuals — the
                  reference's convergence target, common/amg_solver.h:33)
  tts_gnnz_s      the old (r1-r3) convergent-solve throughput, for
                  continuity with BENCH_r0{1,2,3}.json
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", "64"))
RTOL = 1e-8


def _hbm_bandwidth_gbs():
    """Known per-chip HBM bandwidths (GB/s)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0,
             "v6": 1640.0, "cpu": 50.0}
    for k, v in table.items():
        if k in kind:
            return v
    return 819.0


def _vcycle_nnz(stats, n_pre=1, n_post=1):
    """nnz touched by one V-cycle + the PCG fine-level SpMV."""
    total = 0
    L = stats.n_levels
    for l in range(L - 1):
        smooth = (n_pre + n_post) * stats.nnz[l]
        residual = stats.nnz[l]
        total += smooth + residual
    total += stats.rows[-1] ** 2            # coarsest dense solve
    # P and R applications ≈ 2 × Σ nnz(P_l); memory complexity carries Σ P
    return total


def _vcycle_rows(stats, n_pre=1, n_post=1):
    """row (vector-element) traversals matching _vcycle_nnz's counting —
    one entry per SpMV-like pass, used for the DIA-true roofline."""
    total = 0
    L = stats.n_levels
    for l in range(L - 1):
        total += (n_pre + n_post + 1) * stats.rows[l]
    total += stats.rows[-1]
    return total


def main():
    import jax

    # BENCH_PLATFORM=cpu forces the CPU backend even though this image's
    # sitecustomize pre-registers the axon TPU plugin (see tests/conftest).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    # first TPU compile through the tunnel is minutes — persist it
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # fail FAST if the axon tunnel is dead (jax.devices() would hang the
    # driver otherwise): device discovery in a daemon thread with a bound
    import threading

    devs_box = []
    t = threading.Thread(target=lambda: devs_box.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300")))
    if not devs_box:
        print(json.dumps({"metric": "amg_vcycle_pcg_fixed_work_throughput",
                          "value": 0.0, "unit": "Gnnz/s",
                          "vs_baseline": 0.0, "converged": False,
                          "error": "device discovery timed out "
                                   "(axon TPU tunnel down?)"}))
        sys.exit(1)

    from amg_ann_tpu.amg import AMGParams
    from amg_ann_tpu.amg.structured_mg import setup_structured
    from amg_ann_tpu.fem import poisson_7pt
    from amg_ann_tpu.solvers import ir_solve

    a = poisson_7pt(N)
    rng = np.random.default_rng(0)
    b = a.matvec(rng.random(N**3))

    # structured (PFMG-style) hierarchy: every level banded -> the whole
    # V-cycle runs gather-free (DIA / Pallas shifts), the TPU fast path
    # max_coarse_size 2048: fewer levels = much smaller compile surface
    # (matters through the remote-compile tunnel); the 2048² dense coarse
    # solve is one MXU matmul.
    params = AMGParams(strong_threshold=0.25, smoother="chebyshev",
                       dtype=np.float32, max_coarse_size=2048)
    # setup decomposition: stencil upload is per-PROBLEM (θ-independent),
    # the θ-marginal setup (what every further θ of a sweep pays) runs
    # entirely on device from the resident stencil
    import jax.numpy as jnp

    from amg_ann_tpu.amg.boxmg import csr_to_stencil

    s0 = csr_to_stencil(a, (N, N, N)).astype(np.float32)
    a_slots = tuple(k for k in range(27) if s0[k].any())
    t0 = time.perf_counter()
    s_dev = jax.block_until_ready(jnp.asarray(s0))
    t_upload = time.perf_counter() - t0
    # BENCH_HOST_SETUP=1: build the hierarchy on host (numpy) and upload
    # per level — the 256³ device setup peak exceeds single-chip HBM
    host_setup = os.environ.get("BENCH_HOST_SETUP", "0") == "1"
    dev_kw = dict(device_setup=False) if host_setup else {}
    t0 = time.perf_counter()
    h = setup_structured(a, (N, N, N), params, stencil=s_dev if not
                         host_setup else s0, a_slots=a_slots, **dev_kw)
    t_setup_cold = time.perf_counter() - t0       # includes compiles
    if host_setup:
        t_setup = t_setup_cold   # one build: the upload dominates anyway
    else:
        t0 = time.perf_counter()
        h = setup_structured(a, (N, N, N), params, stencil=s_dev,
                             a_slots=a_slots)
        t_setup = time.perf_counter() - t0        # warm marginal

    # warm-up with IDENTICAL static args (max_outer/inner_maxiter are jit
    # statics — different values would recompile inside the timed call).
    # Two opt-in kernel features can in principle fail Mosaic compile on
    # new hardware: the fused coarse-tail (sparse/pallas_cycle.py) and
    # the double-buffered DMA pipeline (sparse/pallas_spmv.PIPELINE_DB).
    # Fall back feature by feature rather than failing the whole bench.
    def _warm():
        return ir_solve(a, b, params, hierarchy=h, rtol=RTOL)

    try:
        res = _warm()
    except Exception as e:
        from amg_ann_tpu.solvers import cycle as _cycle_mod
        from amg_ann_tpu.sparse import pallas_spmv as _ps

        if getattr(h.device, "fused_tail", None) is not None:
            print(f"warm-up failed ({type(e).__name__}); retrying with "
                  "the fused tail disabled", file=sys.stderr)
            _cycle_mod.FUSED_TAIL_MODE = "never"
            try:
                res = _warm()
            except Exception as e2:
                print(f"still failing ({type(e2).__name__}); retrying "
                      "with the DMA pipeline disabled too", file=sys.stderr)
                _ps.PIPELINE_DB = False
                res = _warm()
        else:
            print(f"warm-up failed ({type(e).__name__}); retrying with "
                  "the DMA pipeline disabled", file=sys.stderr)
            _ps.PIPELINE_DB = False
            res = _warm()

    # sustained timing: K identical back-to-back device solves dispatched
    # asynchronously, ONE sync at the end — the axon tunnel costs
    # ~50-100 ms per host round trip, which would otherwise dominate a
    # ~5 ms solve (production = a stream of solves, so sustained
    # throughput is the honest figure)
    from amg_ann_tpu.solvers.refine import ir_device_args

    K = int(os.environ.get("BENCH_REPS", "10"))
    # BENCH_IR_MODE overrides the outer-residual arithmetic ("ds" two-f32
    # Pallas / "f64" emulated double / "auto")
    ir_fn, args, _combine = ir_device_args(
        h, a, b, RTOL, inner_rtol=1e-4, max_outer=20, inner_maxiter=60,
        mode=os.environ.get("BENCH_IR_MODE"))
    out = ir_fn(*args)
    jax.block_until_ready(out)          # warm this exact executable
    from amg_ann_tpu.utils.profiling import trace_if

    t0 = time.perf_counter()
    with trace_if(os.environ.get("BENCH_PROFILE")):
        outs = [ir_fn(*args) for _ in range(K)]
        jax.block_until_ready(outs[-1])
    t_solve = (time.perf_counter() - t0) / K

    p_nnz = sum(p.nnz for p in h.p_mats)
    cyc_nnz = _vcycle_nnz(h.stats) + 2 * p_nnz
    pcg_iter_nnz = cyc_nnz + h.stats.nnz[0]
    total_nnz = (res.inner_iters * pcg_iter_nnz
                 + (res.outer_iters + 1) * h.stats.nnz[0])
    tts_nnz_per_s = total_nnz / t_solve

    # --- headline: FIXED-WORK sustained kernel throughput ---------------
    # exactly FIXED_ITERS PCG iterations (tol=rtol=0 never converges), so
    # the measured work is invariant to convergence-rate improvements.
    from amg_ann_tpu.solvers.amg_solver import _jit_solve

    FIXED_ITERS = int(os.environ.get("BENCH_FIXED_ITERS", "30"))
    a32 = h.device.levels[0].a
    b32 = jnp.asarray(np.asarray(b), dtype=jnp.float32)
    x0_32 = jnp.zeros_like(b32)
    z32 = jnp.float32(0.0)

    def fixed_run():
        return _jit_solve(h.device, a32, b32, x0_32, z32, z32, FIXED_ITERS)

    jax.block_until_ready(fixed_run().x)        # warm the executable
    KF = int(os.environ.get("BENCH_FIXED_REPS", str(K)))
    t0 = time.perf_counter()
    fouts = [fixed_run() for _ in range(KF)]
    jax.block_until_ready(fouts[-1].x)
    t_fixed = (time.perf_counter() - t0) / KF
    # initial r = b - A x0 plus z = M r count as one extra iteration
    fixed_nnz = (FIXED_ITERS + 1) * pcg_iter_nnz
    nnz_per_s = fixed_nnz / t_fixed

    # --- rooflines (VERDICT r4 item 10: format-true accounting) ---------
    # (a) DIA-true: the hot path stores NO column indices. Per SpMV-like
    #     pass a level streams 4 B/nnz of band data plus ~6 f32 vector
    #     streams per ROW (x in, y out, and the fused residual-carrying
    #     smoother's r/b/inv_diag/aux) — x reuse across bands is what the
    #     halo-blocked Pallas kernel buys. vs_baseline is measured bytes/s
    #     over HBM bandwidth under THIS accounting (honest: ~6-8 B/nnz at
    #     a 7-point fine level, vs the ELL 12 B/nnz used through r4).
    # (b) ELL 12 B/nnz (4B data + 4B cols + ~4B gathered x): kept as the
    #     r1-r4 continuity figure, vs_ell_roofline.
    hbm_bs = _hbm_bandwidth_gbs() * 1e9
    rows_per_cycle = _vcycle_rows(h.stats) + 2 * sum(p.nrows
                                                     for p in h.p_mats)
    pcg_iter_rows = rows_per_cycle + h.stats.rows[0]
    fixed_bytes = (FIXED_ITERS + 1) * (4.0 * pcg_iter_nnz
                                       + 24.0 * pcg_iter_rows)
    dia_bytes_per_nnz = fixed_bytes / fixed_nnz
    eff_bytes_per_s = fixed_bytes / t_fixed
    sol_ell = hbm_bs / 12.0

    out = {
        "metric": "amg_vcycle_pcg_fixed_work_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(eff_bytes_per_s / hbm_bs, 4),
        "vs_ell_roofline": round(nnz_per_s / sol_ell, 4),
        "dia_bytes_per_nnz": round(dia_bytes_per_nnz, 2),
        "eff_gb_per_s": round(eff_bytes_per_s / 1e9, 1),
        "fixed_iters": FIXED_ITERS,
        "t_fixed_s": round(t_fixed, 4),
        "tts_s": round(t_solve, 4),
        "tts_gnnz_s": round(tts_nnz_per_s / 1e9, 4),
        "n": N,
        "ndof": N**3,
        "converged": bool(res.converged),
        "true_rel_res": float(res.true_res),
        "outer_iters": res.outer_iters,
        "inner_iters": res.inner_iters,
        "t_setup_s": round(t_setup, 3),
        "t_setup_cold_s": round(t_setup_cold, 2),
        "t_stencil_upload_s": round(t_upload, 3),
        "grid_complexity": round(h.stats.grid_complexity, 3),
        "operator_complexity": round(h.stats.operator_complexity, 3),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
