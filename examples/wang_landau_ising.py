"""Wang-Landau density of states of the 2-D Ising model, and the full
temperature dependence of energy and specific heat from ONE simulation.

Flat-histogram sampling estimates log g(E) directly; canonical expectations
at any temperature then follow by reweighting — no per-temperature runs, no
critical slowing down.  For L=4 the result is checked against the exactly
enumerated density of states (2^16 states).

Run:  python examples/wang_landau_ising.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import montecarlo_tpu as mc
from montecarlo_tpu.core.wanglandau import mean_log_g, reweight
from montecarlo_tpu.models import ising2d

L = 4
STEPS = 60_000          # x16 proposals per step ~ 1M proposals per walker
CHAINS = 8              # independent parallel walkers (averaged at the end)

chains = ising2d.init_chains(CHAINS, size=L, beta=1.0, seed=1)
sim = mc.Simulation(
    ising2d.make_system(), chains,
    [dict(algorithm=mc.WangLandau, model=ising2d.wl_model(L),
          moves_per_step=L * L, seed=1),
     dict(algorithm=mc.WangLandauRefine, flatness=0.8, log_f_min=1e-4,
          dependencies=(mc.WangLandau,),
          scheduler=np.arange(250, STEPS + 1, 250)),
     dict(algorithm=mc.StoreCallbacks,
          callbacks=[mc.callback_wl_log_f, mc.callback_wl_flatness],
          scheduler=mc.build_schedule(STEPS, 0, 1000))],
    STEPS, path="data/wang_landau_ising")
sim.run()

slc = sim.device_state["wang_landau"]
log_g, support = mean_log_g(slc, anchor_bin=0, anchor_log_g=np.log(2.0))
energies = ising2d.wl_bin_energies(L)
exact = ising2d.exact_log_g(L)

print(f"final log f per walker: {np.asarray(slc['log_f'])}")
# compare over the bins both the walkers and exact enumeration support; a
# reachable-but-unvisited bin is a discrepancy to report, not a crash
exact_support = np.isfinite(exact)
common = support & exact_support
err = np.abs(log_g[common] - exact[common])
print(f"max |log g - exact| over {common.sum()} common bins: {err.max():.3f}")
if (missed := exact_support & ~support).any():
    print(f"WARNING: {missed.sum()} reachable bins never visited: "
          f"E = {ising2d.wl_bin_energies(L)[missed]}")
if (spurious := support & ~exact_support).any():
    print(f"WARNING: {spurious.sum()} visited bins outside exact support: "
          f"E = {ising2d.wl_bin_energies(L)[spurious]}")

print(f"\n{'beta':>8} {'<E>/N (WL)':>12} {'<E>/N exact':>12} "
      f"{'C/N (WL)':>10} {'C/N exact':>10}")
n = L * L
for beta in np.linspace(0.1, 1.0, 10):
    _, e_wl, v_wl = reweight(log_g, energies, beta)
    _, e_ex, v_ex = reweight(exact, energies, beta)
    print(f"{beta:8.2f} {e_wl / n:12.4f} {e_ex / n:12.4f} "
          f"{beta**2 * v_wl / n:10.4f} {beta**2 * v_ex / n:10.4f}")
