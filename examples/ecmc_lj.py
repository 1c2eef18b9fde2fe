"""Soft-potential event-chain MC on the 2-D Lennard-Jones fluid.

Runs the exact factorized-Metropolis event chain (closed-form LJ factor
events, ``models/lennard_jones.ecmc_model``) side by side with local
Metropolis on the same system, and cross-checks THREE independent routes
to the pressure:

  1. the MKK lifting-event estimator accumulated by the event chain,
  2. the configurational virial average from the ECMC trajectory,
  3. the virial average from the Metropolis trajectory.

Run:  python examples/ecmc_lj.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import montecarlo_tpu as mc  # noqa: E402
from montecarlo_tpu.models import lennard_jones as lj  # noqa: E402

N, M, STEPS = 64, 64, 200
RHO, BETA, ELL = 0.6, 1.0, 1.5
PAR = lj.LJParams()


def run(kind, path):
    chains = lj.init_chains(M, N, rho=RHO, beta=BETA, frac_b=0.0, seed=1,
                            params=PAR)
    if kind == "ecmc":
        algo = dict(algorithm=mc.EventChain,
                    model=lj.ecmc_model(ELL, params=PAR),
                    events_per_step=8, seed=2)
    else:
        algo = dict(algorithm=mc.Metropolis,
                    pool=(lj.lj_displacement_move(0.25, params=PAR),),
                    seed=3, sweepstep=N)
    def callback_pressure(view):
        return lj.callback_pressure(view, PAR)

    sim = mc.Simulation(lj.make_system(PAR), chains, [
        algo,
        dict(algorithm=mc.StoreCallbacks,
             callbacks=(lj.callback_energy_per_particle, callback_pressure),
             scheduler=np.arange(5, STEPS + 1, 5)),
    ], STEPS, path=path)
    sim.run()
    e = np.loadtxt(os.path.join(path, "energy_per_particle.dat"))
    return sim, e


def main():
    sim_e, e_ecmc = run("ecmc", "data/ecmc_lj/ecmc")
    sim_m, e_met = run("met", "data/ecmc_lj/met")
    tail = lambda d: d[d[:, 0] > STEPS // 2, 1]
    print(f"e/N   ECMC {tail(e_ecmc).mean():+.4f}  "
          f"Metropolis {tail(e_met).mean():+.4f}")

    stats = sim_e.device_state["ecmc"]["stats"]
    excess = np.asarray(stats["excess"], np.float64).sum()
    nch = np.asarray(stats["chains"], np.float64).sum()
    p_mkk = 1.0 + excess / (nch * ELL)
    for name, sim in (("ECMC", sim_e), ("Metropolis", sim_m)):
        st = sim.device_state["sys"]
        pv = float(np.mean(np.asarray(jax.vmap(
            lambda s: lj.virial_pressure(s, PAR))(st))))
        print(f"beta P / rho ({name} virial): {pv * BETA / RHO:.3f}")
    print(f"beta P / rho (MKK lifting events): {p_mkk:.3f}")
    ncoll = int(np.asarray(stats["collisions"]).sum())
    print(f"lifting events: {ncoll} (cap_hits "
          f"{int(np.asarray(stats['cap_hits']).sum())})")


if __name__ == "__main__":
    main()
