"""Verify drive: public-API end-to-end on the real TPU chip."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import montecarlo_tpu as mc
from montecarlo_tpu.models import particle1d as p1d

print("backend:", jax.default_backend())

# 1) README happy path with the BIN chain-major store + acceptance
system = p1d.make_system(p1d.harmonic)
chains = p1d.init_chains(10, beta=2.0, seed=42)
pool = (p1d.displacement_move(sigma=0.5),)
steps = 10_000
times = mc.build_schedule(steps, 1000, [0, 10])
sim = mc.Simulation(system, chains, [
    dict(algorithm=mc.Metropolis, pool=pool, seed=42),
    dict(algorithm=mc.StoreCallbacks,
         callbacks=(p1d.callback_energy, mc.callback_acceptance),
         scheduler=times),
    dict(algorithm=mc.StoreTrajectories, scheduler=times),
    dict(algorithm=mc.StoreTrajectories, fmt=mc.BIN(), scheduler=times),
], steps, path="/tmp/drive_run")
sim.run()
E = np.loadtxt("/tmp/drive_run/energy.dat")
e_tail = E[E[:, 0] > 2000, 1].mean()
print("energy tail:", e_tail, "(want ~0.25)")
assert abs(e_tail - 0.25) < 0.02
A = np.loadtxt("/tmp/drive_run/acceptance.dat")
print("acceptance final:", A[-1, 1])
assert 0.05 < A[-1, 1] < 0.99
x1 = np.loadtxt("/tmp/drive_run/trajectories/1/trajectory.dat")[:, 1]
ts, fields = mc.load_chain_major_trajectories("/tmp/drive_run")
xm = np.asarray(fields["frame"])
print("text vs bin store identical:",
      np.array_equal(x1, xm[:, 0].astype(np.float64)))
assert np.array_equal(x1.astype(np.float32), xm[:, 0])
allx = xm[len(ts) // 2:].ravel()
print("pos mean/std:", allx.mean(), allx.std(), "want 0 /", 1 / 2)
assert abs(allx.mean()) < 0.03 and abs(allx.std() - 0.5) < 0.03

# 2) large-N LJ NPT through the auto-selected cell path ON TPU
from montecarlo_tpu.models import lennard_jones as lj
P = 2.0
chains = lj.init_chains(8, 2048, rho=0.65, beta=1.0, frac_b=0.0, seed=41)
pool = (lj.lj_displacement_move(0.12, weight=0.95),
        lj.lj_volume_move(dlnv=0.003, pressure=P, weight=0.05))
sim2 = mc.Simulation(
    lj.make_system(), chains,
    [dict(algorithm=mc.Metropolis, pool=pool, seed=1, sweepstep=512),
     dict(algorithm=mc.StoreCallbacks, callbacks=(lj.callback_density,),
          scheduler=np.arange(5, 61, 5))],
    60, path="/tmp/drive_npt")
met = sim2.device_algos[0]
print("cell path:", met._use_cell, met._cell_plan)
assert met._use_cell
sim2.run()
cnt = np.asarray(sim2.device_state["metropolis"]["counters"])
print("disp att/acc:", cnt[:, 0, 1].sum(), cnt[:, 0, 0].sum(),
      "vol att/acc:", cnt[:, 1, 1].sum(), cnt[:, 1, 0].sum())
assert cnt[:, 1, 0].sum() > 0
st = sim2.device_state["sys"]
e_true = np.asarray(jax.lax.map(lambda s: lj.total_energy(s, lj.LJParams()), st))
err = np.abs(np.asarray(st.energy) - e_true)
print("energy cache err:", err.max())
assert err.max() < 0.5
rho = 2048 / np.asarray(st.box) ** 2
print("densities:", rho)
print("ALL VERIFY CHECKS PASSED")
