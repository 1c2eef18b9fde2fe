"""Event-chain Monte Carlo for 2-D hard disks: equation of state.

Straight event chains (Bernard-Krauth-Wilson) are rejection-free and
non-reversible; the pressure comes for free from the chain-span estimator
(Michel-Kapfer-Krauth 2014): beta P / rho = 1 + <excess>/chain_length,
where excess sums the projected contact separations over collisions.

Prints the equation of state across packing fractions against the
low-density virial expansion (B2..B5).

Run:  python examples/ecmc_hard_disks.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc
from montecarlo_tpu.models import hard_disks as hd

N_DISKS, N_CHAINS, STEPS = 32, 64, 150
CHAIN_LENGTH = 3.0

b2 = np.pi / 2


def virial(rho):
    return (1.0 + b2 * rho + 0.78202 * b2 ** 2 * rho ** 2
            + 0.53223 * b2 ** 3 * rho ** 3 + 0.33356 * b2 ** 4 * rho ** 4)


print(f"hard disks: N={N_DISKS}, {N_CHAINS} chains, straight event chains")
print(f"{'eta':>6} {'rho':>7} {'bP/rho ECMC':>12} {'virial(B2..B5)':>15} "
      f"{'collisions/chain':>17}")
for eta in (0.05, 0.15, 0.25):
    rho = 4.0 * eta / np.pi
    chains = hd.init_chains(N_CHAINS, N_DISKS, eta, seed=3)
    sim = mc.Simulation(
        hd.make_system(), chains,
        [dict(algorithm=mc.EventChain, model=hd.ecmc_model(CHAIN_LENGTH),
              events_per_step=8, seed=11)],
        STEPS, path=f"data/hd_ecmc/eta{eta}")
    sim.run()
    st = sim.device_state["ecmc"]["stats"]
    assert np.asarray(st["cap_hits"]).sum() == 0
    p = hd.ecmc_pressure(st, CHAIN_LENGTH)
    cpc = (np.asarray(st["collisions"]).sum()
           / np.asarray(st["chains"]).sum())
    print(f"{eta:6.2f} {rho:7.4f} {p:12.4f} {virial(rho):15.4f} {cpc:17.2f}")
print("\n(virial truncated at B5: expect growing deviation beyond eta~0.25)")
