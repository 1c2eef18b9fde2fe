"""Classical XY (planar rotor) model on a periodic 2-D square lattice.

First continuous-spin lattice family, extending the discrete Ising/Potts
modules to show the protocol (state pytree with cached energy + incremental
delta-energy moves, the ``perform_action_cached!`` idea of
``src/metropolis.jl:119`` expressed as pure functions) is not tied to
integer state.

Hamiltonian: ``E = -J * sum_<ij> cos(theta_i - theta_j)`` over
nearest-neighbour bonds, angles in ``[0, 2 pi)``.

Sampling paths:

- :func:`rotation_move` — single-site angle perturbation through the generic
  :class:`~montecarlo_tpu.core.moves.MoveDef` protocol: site uniform,
  ``dtheta ~ U[-delta, delta]`` (symmetric), O(1) delta-energy from the four
  neighbours.
- :class:`CheckerboardXY` — whole-lattice bipartite Metropolis sweeps (even
  lattices only, same restriction as the Ising/Potts checkerboards), each
  optionally followed by microcanonical OVER-RELAXATION sweeps: reflect every
  active-parity spin about its local field, ``theta -> 2 phi - theta`` with
  ``phi = arg(sum_nb e^{i theta_nb})``.  The reflection preserves each site's
  neighbour energy exactly (``sum_nb cos(theta - theta_nb) =
  |h| cos(theta - phi)`` is even about ``phi``), so it is rejection-free,
  drastically decorrelates the angles, and costs a handful of fused (L, L)
  vector ops.  Over-relaxation alone is not ergodic (energy-conserving);
  mixed with Metropolis sweeps it is.

Ground truth: :func:`exact_moments` integrates the 2x2 periodic lattice by
the tensor-product periodic rectangle rule (spectrally convergent for smooth
periodic integrands) — a non-statistical reference for the tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.algorithms import DeviceAlgorithm
from ..core.moves import Move, MoveDef, Policy
from ..core.system import SystemDef

__all__ = ["XYState", "make_system", "init_chains", "rotation_move",
           "UniformRotation", "GaussianRotation",
           "checkerboard_sweep", "overrelax_sweep", "CheckerboardXY",
           "exact_moments",
           "callback_energy_per_spin", "callback_magnetisation"]

TWO_PI = 2.0 * np.pi


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class XYState:
    theta: jax.Array   # (L, L) f32 angles in [0, 2 pi)
    beta: jax.Array    # ()
    j: jax.Array       # () coupling
    energy: jax.Array  # () cached total energy


def _bond_energy(theta, j):
    """-J * sum over right+down... up/left bonds via roll(+1): each
    nearest-neighbour bond counted exactly once over the lattice."""
    return -j * jnp.sum(jnp.cos(theta - jnp.roll(theta, 1, 0))
                        + jnp.cos(theta - jnp.roll(theta, 1, 1)))


def _neighbour_field(theta):
    """Local field h = sum_nb e^{i theta_nb} as (hx, hy); four rolls each."""
    c, s = jnp.cos(theta), jnp.sin(theta)

    def nsum(a):
        return (jnp.roll(a, 1, 0) + jnp.roll(a, -1, 0)
                + jnp.roll(a, 1, 1) + jnp.roll(a, -1, 1))

    return nsum(c), nsum(s)


def make_system() -> SystemDef:
    def log_target(state: XYState):
        return -state.beta * state.energy

    def frame(state: XYState):
        return {"m": _magnetisation(state.theta), "e": state.energy}

    def format_frame(t, fr):
        return f"{t} {float(fr['m'])!r} {float(fr['e'])!r}"

    return SystemDef(name="XY2D", log_target=log_target, frame=frame,
                     format_frame=format_frame)


def init_chains(n_chains: int, size: int, beta: float, j: float = 1.0,
                seed: int = 42) -> XYState:
    key = jax.random.key(seed)
    theta = TWO_PI * jax.random.uniform(key, (n_chains, size, size),
                                        jnp.float32)
    state = XYState(
        theta=theta,
        beta=jnp.full((n_chains,), beta, jnp.float32),
        j=jnp.full((n_chains,), j, jnp.float32),
        energy=jnp.zeros((n_chains,), jnp.float32),
    )
    energy = jax.vmap(lambda st: _bond_energy(st.theta, st.j))(state)
    return dataclasses.replace(state, energy=energy)


# ---------------------------------------------------------------------------
# Path 1: single-site rotation through the generic move protocol
# ---------------------------------------------------------------------------

class UniformRotation(Policy):
    """(site, dtheta) with site uniform over L² and ``dtheta ~ U[-delta,
    delta]``.  Symmetric and self-inverse in density, like the reference
    example's Gaussian displacement; ``delta`` is a learnable parameter."""

    def sample(self, params, key, state):
        k_site, k_ang = jax.random.split(key)
        n = state.theta.shape[0] * state.theta.shape[1]
        site = jax.random.randint(k_site, (), 0, n)
        dtheta = params["delta"] * (
            2.0 * jax.random.uniform(k_ang, (), jnp.float32) - 1.0)
        return {"site": site, "dtheta": dtheta}

    def log_density(self, params, action, state):
        n = state.theta.shape[0] * state.theta.shape[1]
        return -jnp.log(jnp.asarray(float(n), jnp.float32)) - jnp.log(
            2.0 * params["delta"])


class GaussianRotation(Policy):
    """(site, dtheta) with site uniform and ``dtheta ~ N(0, sigma^2)``.

    The PGMC-learnable variant: unlike the uniform box
    (:class:`UniformRotation`), whose score function ``d log q / d delta =
    -1/delta`` is independent of the sampled action (REINFORCE cannot see
    the support boundary, so the estimator always shrinks a box half-width),
    the Gaussian's score ``dtheta^2/sigma^3 - 1/sigma`` carries the
    information policy-gradient optimisers need — same reason the reference
    example learns a Gaussian sigma (``particle_1d.jl:48-59``).
    """

    def sample(self, params, key, state):
        k_site, k_ang = jax.random.split(key)
        n = state.theta.shape[0] * state.theta.shape[1]
        site = jax.random.randint(k_site, (), 0, n)
        dtheta = params["sigma"] * jax.random.normal(k_ang, dtype=jnp.float32)
        return {"site": site, "dtheta": dtheta}

    def log_density(self, params, action, state):
        n = state.theta.shape[0] * state.theta.shape[1]
        sigma = params["sigma"]
        d = action["dtheta"]
        return (-jnp.log(jnp.asarray(float(n), jnp.float32))
                - (d * d) / (2.0 * sigma * sigma)
                - 0.5 * jnp.log(2.0 * jnp.pi * sigma * sigma))


def rotation_move(delta: float, weight: float = 1.0,
                  policy: str = "uniform") -> Move:
    """Single-site rotation move.

    ``policy="uniform"``: ``dtheta ~ U[-delta, delta]`` (classic XY sweep
    proposal).  ``policy="gaussian"``: ``dtheta ~ N(0, delta^2)`` — pick this
    when the width should be PGMC-learnable (see :class:`GaussianRotation`).
    """
    def apply(state: XYState, action):
        th = state.theta
        lx, ly = th.shape
        i, k = action["site"] // ly, action["site"] % ly
        old = th[i, k]
        new = jnp.mod(old + action["dtheta"], TWO_PI)
        nbs = jnp.stack([th[(i - 1) % lx, k], th[(i + 1) % lx, k],
                         th[i, (k - 1) % ly], th[i, (k + 1) % ly]])
        d_e = -state.j * jnp.sum(jnp.cos(new - nbs) - jnp.cos(old - nbs))
        theta = th.at[i, k].set(new)
        new_state = dataclasses.replace(
            state, theta=theta, energy=state.energy + d_e)
        return new_state, -state.beta * d_e

    def invert(action, new_state):
        return {"site": action["site"], "dtheta": -action["dtheta"]}

    def reward(action, new_state):
        return action["dtheta"] * action["dtheta"]

    if policy == "uniform":
        pol = UniformRotation()
        params = {"delta": jnp.asarray(delta, jnp.float32)}
        kind = "xy_rotation"
    elif policy == "gaussian":
        pol = GaussianRotation()
        params = {"sigma": jnp.asarray(delta, jnp.float32)}
        kind = "xy_rotation_gaussian"
    else:
        raise ValueError(f"unknown rotation policy {policy!r}; "
                         f"expected 'uniform' or 'gaussian'")
    md = MoveDef(name="Rotation", policy=pol, apply=apply,
                 invert=invert, reward=reward, kind=kind)
    return Move(move=md, params=params, weight=weight)


# ---------------------------------------------------------------------------
# Path 2: checkerboard Metropolis + over-relaxation sweeps
# ---------------------------------------------------------------------------

def _parity_mask(lx, ly, parity):
    ii, kk = jnp.meshgrid(jnp.arange(lx), jnp.arange(ly), indexing="ij")
    return ((ii + kk) % 2) == parity


def checkerboard_half_sweep(state: XYState, parity, delta, key):
    """Metropolis-perturb every site of one sublattice simultaneously.

    Requires even lattice dimensions (periodic odd lattices are not
    bipartite — same restriction and guard as the Ising/Potts paths).
    """
    th = state.theta
    lx, ly = th.shape
    if lx % 2 or ly % 2:
        raise ValueError(
            f"checkerboard sweeps need even lattice dimensions, got "
            f"({lx}, {ly}): the parity mask is not a proper 2-colouring of a "
            f"periodic odd lattice (wrap-around neighbours share a parity)")
    k_ang, k_acc = jax.random.split(key)
    mask = _parity_mask(lx, ly, parity)

    prop = jnp.mod(th + delta * (2.0 * jax.random.uniform(
        k_ang, (lx, ly), jnp.float32) - 1.0), TWO_PI)

    hx, hy = _neighbour_field(th)
    # sum_nb cos(x - theta_nb) = cos(x) hx + sin(x) hy
    e_old = -(jnp.cos(th) * hx + jnp.sin(th) * hy)
    e_new = -(jnp.cos(prop) * hx + jnp.sin(prop) * hy)
    d_e = state.j * (e_new - e_old)

    u = jax.random.uniform(k_acc, (lx, ly), jnp.float32)
    accept = mask & (jnp.log(u) < -state.beta * d_e)
    theta = jnp.where(accept, prop, th)
    energy = state.energy + jnp.sum(jnp.where(accept, d_e, 0.0))
    new_state = dataclasses.replace(state, theta=theta, energy=energy)
    return new_state, jnp.sum(accept, dtype=jnp.int32)


def checkerboard_sweep(state: XYState, delta, key):
    k0, k1 = jax.random.split(key)
    state, a0 = checkerboard_half_sweep(state, 0, delta, k0)
    state, a1 = checkerboard_half_sweep(state, 1, delta, k1)
    return state, a0 + a1


def overrelax_half_sweep(state: XYState, parity):
    """Reflect every active-parity spin about its local field direction.

    theta -> 2 phi - theta with phi = atan2(hy, hx); exactly
    energy-preserving (the site's neighbour energy is even about phi) and
    deterministic — a microcanonical move, free of PRNG and exp/log costs.
    Sites with |h| = 0 have constant local energy, so reflecting about
    phi = atan2(0, 0) = 0 is still energy-preserving.
    """
    th = state.theta
    lx, ly = th.shape
    mask = _parity_mask(lx, ly, parity)
    hx, hy = _neighbour_field(th)
    phi = jnp.arctan2(hy, hx)
    reflected = jnp.mod(2.0 * phi - th, TWO_PI)
    theta = jnp.where(mask, reflected, th)
    return dataclasses.replace(state, theta=theta)


def overrelax_sweep(state: XYState):
    state = overrelax_half_sweep(state, 0)
    return overrelax_half_sweep(state, 1)


class CheckerboardXY(DeviceAlgorithm):
    """DeviceAlgorithm: checkerboard Metropolis + over-relaxation driver.

    Per simulation step: ``sweeps`` x (one Metropolis checkerboard sweep +
    ``overrelax`` over-relaxation sweeps).  Same lifecycle/device-state
    contract as the other lattice drivers (counter-based per-chain RNG
    streams; counters[chain, 0] = (accepted, attempted) over the Metropolis
    attempts only — over-relaxation is rejection-free by construction).
    """

    state_key = "checkerboard_xy"

    def __init__(self, sim, sweeps: int = 1, overrelax: int = 0,
                 delta: float = 1.0, seed: int = 1, dependencies=(), **_):
        self.sweeps = int(sweeps)
        self.overrelax = int(overrelax)
        self.delta = float(delta)
        self.seed = int(seed)
        self.n_chains = sim.n_chains
        theta = sim.chains0.theta
        self.lattice_shape = tuple(int(d) for d in theta.shape[1:])
        if any(d % 2 for d in self.lattice_shape):
            raise ValueError(
                f"{type(self).__name__} needs even lattice dimensions, got "
                f"{self.lattice_shape}: the parity mask is not a proper "
                f"2-colouring of a periodic odd lattice")

    def init_state(self, sim):
        base = jax.random.key(self.seed)
        chain_ids = jnp.arange(self.n_chains, dtype=jnp.uint32)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(base, chain_ids)
        counters = jnp.zeros((self.n_chains, 1, 2), jnp.int32)
        return {"keys": keys, "counters": counters}

    def step(self, dstate, t):
        slc = dstate[self.state_key]
        step_keys = jax.vmap(jax.random.fold_in, (0, None))(
            slc["keys"], t.astype(jnp.uint32))
        delta = jnp.asarray(self.delta, jnp.float32)

        def one_pass(st, k):
            st, a = checkerboard_sweep(st, delta, k)
            for _ in range(self.overrelax):
                st = overrelax_sweep(st)
            return st, a

        def one_chain(st, key):
            keys = jax.random.split(key, self.sweeps)

            def body(carry, k):
                st, acc = carry
                st, a = one_pass(st, k)
                return (st, acc + a), None

            (st, acc), _ = jax.lax.scan(
                body, (st, jnp.zeros((), jnp.int32)), keys)
            return st, acc

        sys, acc = jax.vmap(one_chain)(dstate["sys"], step_keys)
        attempts = self.sweeps * int(np.prod(self.lattice_shape))
        inc = jnp.stack(
            [acc, jnp.full_like(acc, attempts)], axis=-1)[:, None, :]
        return {**dstate, "sys": sys,
                self.state_key: {**slc, "counters": slc["counters"] + inc}}

    def write_summary(self, io, scheduler):
        from ..core.algorithms import _n_calls
        io.write("\tCheckerboardXY\n")
        io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
        io.write(f"\t\tSweeps per step: {self.sweeps}\n")
        io.write(f"\t\tOver-relaxation sweeps per Metropolis sweep: "
                 f"{self.overrelax}\n")
        io.write(f"\t\tProposal half-width delta: {self.delta}\n")
        io.write(f"\t\tLattice: {self.lattice_shape}\n")
        io.write(f"\t\tSeed: {self.seed}\n")


# ---------------------------------------------------------------------------
# Observables + exact ground truth
# ---------------------------------------------------------------------------

def _magnetisation(theta):
    n = theta.shape[-1] * theta.shape[-2]
    mx = jnp.sum(jnp.cos(theta), axis=(-2, -1)) / n
    my = jnp.sum(jnp.sin(theta), axis=(-2, -1)) / n
    return jnp.sqrt(mx * mx + my * my)


def callback_energy_per_spin(view):
    n = view.sys.theta.shape[-1] * view.sys.theta.shape[-2]
    return jnp.mean(view.sys.energy) / n


def callback_magnetisation(view):
    return jnp.mean(_magnetisation(view.sys.theta))


def exact_moments(beta: float, j: float = 1.0, n_quad: int = 48):
    """Quadrature Boltzmann expectations on the 2x2 periodic lattice.

    Tensor-product periodic rectangle rule over [0, 2 pi)^4 — spectrally
    accurate for the smooth periodic integrand.  Returns
    ``(energy per spin, mean magnetisation)`` with the same bond convention
    as :func:`_bond_energy` (on L=2 each pair is a double bond, counted by
    both rolls — consistent between sampler and quadrature).
    """
    th = (np.arange(n_quad) + 0.5) * TWO_PI / n_quad
    a, b, c, d = np.meshgrid(th, th, th, th, indexing="ij")
    theta = np.stack([np.stack([a, b], -1), np.stack([c, d], -1)], -2)
    # (..., 2, 2) lattice; bonds via roll(+1) on the last two axes
    e = -j * (np.cos(theta - np.roll(theta, 1, -2))
              + np.cos(theta - np.roll(theta, 1, -1))).sum((-2, -1))
    w = np.exp(-beta * (e - e.min()))
    z = w.sum()
    mx = np.cos(theta).mean((-2, -1))
    my = np.sin(theta).mean((-2, -1))
    m = np.sqrt(mx * mx + my * my)
    return float((w * e).sum() / z / 4.0), float((w * m).sum() / z)
