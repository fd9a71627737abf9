"""Multi-host scaling measurement via jax.distributed (SPMD processes).

Two phases, same solve (dist/structured.dist_structured_solve — every
operand on the mesh, halo exchange inside the V-cycle):

  1. baseline: ONE process, D local devices → nnz/s on a D-device mesh;
  2. scaled:   P processes × D local devices, jax.distributed.initialize
               joins them into one P·D-device global mesh → nnz/s.

Scaling efficiency = nnz/s(P·D) / (P · nnz/s(D)) — the BASELINE.md north
star asks ≥70% from 1 host to N hosts. On a TPU pod slice run this
unmodified on every host (the pod runtime autofills the initialize args);
here it also runs on CPU with virtual devices as a mechanical validation
of the cross-process mesh + collectives (NOTE: CPU processes share the
same physical cores, so the CPU efficiency number measures oversubscription,
not interconnect — it validates plumbing, not bandwidth).

    python examples/run_multihost_scaling.py --procs 2 --local-devices 2 \
        --n 48 [--out bench/multihost_cpu.json]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.procs > 1:
        from amg_ann_tpu.dist.multihost import initialize

        initialize(coordinator_address=args.coord,
                   num_processes=args.procs, process_id=args.pid)
    from amg_ann_tpu.dist.multihost import comm_breakdown, measure_mesh

    if args.breakdown:
        rep = comm_breakdown(n=args.n, iters=args.iters)
    else:
        rep = measure_mesh(n=args.n, rtol=args.rtol)
    if jax.process_index() == 0:
        with open(args.result, "w") as f:
            json.dump(rep, f)
    # multi-process shutdown wants everyone to reach the end together
    if args.procs > 1:
        jax.distributed.shutdown()


def spawn(phase_procs, local_devices, args, result_path):
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{local_devices}")
    procs = []
    for pid in range(phase_procs):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--procs", str(phase_procs), "--pid", str(pid),
               "--coord", args.coord, "--n", str(args.n),
               "--rtol", str(args.rtol), "--platform", args.platform,
               "--iters", str(args.iters),
               "--result", result_path] \
              + (["--breakdown"] if args.breakdown else [])
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO))
    rcs = [p.wait() for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"
    with open(result_path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--coord", default="localhost:9911")
    ap.add_argument("--out", default=None)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--result", default=None)
    ap.add_argument("--breakdown", action="store_true",
                    help="comm/compute A/B at fixed iterations "
                         "(dist/multihost.comm_breakdown) instead of the "
                         "convergent-solve throughput measurement")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    with tempfile.TemporaryDirectory() as td:
        base = spawn(1, args.local_devices, args, os.path.join(td, "b.json"))
        scaled = spawn(args.procs, args.local_devices, args,
                       os.path.join(td, "s.json"))

    if args.breakdown:
        report = {
            "n": args.n,
            "platform": args.platform,
            "mode": "comm_breakdown",
            "baseline_1proc": base,
            "scaled": scaled,
            "hosts": args.procs,
        }
        print(json.dumps(report))
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
        return

    assert base["niters"] == scaled["niters"], (base, scaled)
    report = {
        "n": args.n,
        "platform": args.platform,
        "baseline": base,
        "scaled": scaled,
        "hosts": args.procs,
        "scaling_efficiency":
            scaled["nnz_per_s"] / (args.procs * base["nnz_per_s"]),
    }
    print(json.dumps(report))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
