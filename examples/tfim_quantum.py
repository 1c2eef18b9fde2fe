"""Quantum Monte Carlo: the transverse-field Ising chain across its
quantum critical region, against exact diagonalization.

The Suzuki-Trotter mapping turns the N-spin quantum chain at inverse
temperature beta into an (N, M) classical space-time lattice; checkerboard
sweeps sample it, and quantum observables come from equal-time correlations
(sigma^z sector) and temporal-bond statistics (sigma^x).  For N=8 the dense
ED ground truth (2^8 states) is computed alongside.

Run:  python examples/tfim_quantum.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc
from montecarlo_tpu.models import tfim

N, M, BETA, J = 8, 64, 2.0, 1.0
CHAINS, STEPS, SWEEPS = 256, 200, 15

print(f"TFIM chain: N={N}, M={M} slices, beta={BETA}, J={J}")
print(f"{'h':>5} {'<sx> QMC':>9} {'<sx> ED':>8} {'<szsz> QMC':>11} "
      f"{'<szsz> ED':>10} {'<mz2> QMC':>10} {'<mz2> ED':>9}")

for h in (0.4, 1.0, 1.6):
    chains = tfim.init_chains(CHAINS, N, M, BETA, j=J, h=h, seed=7)
    cb_sx = tfim.make_sx_callback(BETA, h, M)
    sim = mc.Simulation(
        tfim.make_system(), chains,
        [dict(algorithm=tfim.TFIMCheckerboard, sweeps=SWEEPS, seed=7),
         dict(algorithm=mc.StoreCallbacks,
              callbacks=(cb_sx, tfim.callback_szsz, tfim.callback_sz2),
              scheduler=mc.build_schedule(STEPS, 0, 2))],
        STEPS, path=f"data/tfim/h{h}")
    sim.run()

    def tail(name):
        d = np.loadtxt(f"data/tfim/h{h}/{name}.dat")
        return d[d[:, 0] >= STEPS // 2, 1].mean()

    ex = tfim.ed_observables(N, BETA, J, h)
    print(f"{h:5.1f} {tail('sx'):9.4f} {ex['sx']:8.4f} "
          f"{tail('szsz'):11.4f} {ex['szsz']:10.4f} "
          f"{tail('sz2'):10.4f} {ex['mz2']:9.4f}")
