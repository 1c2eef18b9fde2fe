"""End-to-end test of a fully user-defined system built only from public
API pieces (dict state + generic_apply, no cached energies) — the
"system-agnostic" promise of the reference exercised through the whole
stack."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

import montecarlo_tpu as mc


class GaussianStep(mc.Policy):
    def sample(self, params, key, state):
        return params["width"] * jax.random.normal(key)

    def log_density(self, params, action, state):
        w = params["width"]
        return -(action * action) / (2 * w * w) - 0.5 * jnp.log(
            2 * jnp.pi * w * w)


def test_custom_dict_state_system(tmp_path):
    # target: standard normal on a plain dict state, no energy caching
    log_target = lambda s: -0.5 * s["x"] ** 2
    system = mc.SystemDef(
        name="CustomGaussian",
        log_target=log_target,
        frame=lambda s: s["x"],
        format_frame=lambda t, x: f"{t} {float(x)!r}",
    )
    apply = mc.generic_apply(lambda s, a: {"x": s["x"] + a}, log_target)
    move = mc.Move(
        move=mc.MoveDef(name="Step", policy=GaussianStep(), apply=apply,
                        invert=lambda a, s: -a),
        params={"width": jnp.asarray(1.0, jnp.float32)},
        weight=1.0)

    m, steps, burn = 64, 10 ** 4, 500
    chains = {"x": jnp.linspace(-2.0, 2.0, m)}
    times = mc.build_schedule(steps, burn, 10)
    path = str(tmp_path / "custom")
    sim = mc.Simulation(system, chains, [
        dict(algorithm=mc.Metropolis, pool=(move,), seed=9),
        dict(algorithm=mc.StoreTrajectories, scheduler=times),
    ], steps, path=path)
    sim.run()

    pos = np.concatenate([
        np.loadtxt(f)[1:, 1] for f in glob.glob(
            os.path.join(path, "trajectories", "*", "trajectory.dat"))])
    assert abs(pos.mean()) < 0.02
    assert abs(pos.std() - 1.0) < 0.02
