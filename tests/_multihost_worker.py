"""Worker process for the 2-process multi-host test.

Usage: python _multihost_worker.py <pid> <nproc> <port> <outdir>

Each process owns 2 virtual CPU devices; the 4-device global mesh shards 8
chains.  Process 0 writes the recorder tree; the final energy series must
match a single-process run of the same configuration.
"""

import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import montecarlo_tpu as mc  # noqa: E402
from montecarlo_tpu.models import particle1d as p1d  # noqa: E402
from montecarlo_tpu.parallel import make_mesh  # noqa: E402


def build_sim(path, mesh):
    system = p1d.make_system(p1d.harmonic)
    chains = p1d.init_chains(8, beta=2.0, seed=42)
    pool = (p1d.displacement_move(sigma=0.5),)
    steps = 60
    times = mc.build_schedule(steps, 10, 10)
    return mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=pool, seed=42),
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(p1d.callback_energy, mc.callback_acceptance),
             scheduler=times),
        dict(algorithm=mc.StoreTrajectories, scheduler=times),
        dict(algorithm=mc.StoreBackups, scheduler=np.asarray([30])),
        dict(algorithm=mc.StoreParameters, dependencies=(mc.Metropolis,),
             scheduler=times),
        dict(algorithm=mc.Throughput, scheduler=times),
    ], steps, path=path, mesh=mesh)


mesh = make_mesh(devices=jax.devices())
assert len(jax.devices()) == 2 * nproc, jax.devices()
sim = build_sim(os.path.join(outdir, "multi"), mesh)
sim.run()
print(f"worker {pid} done", flush=True)
