"""Classical Heisenberg (O(3)) model on a periodic 2-D square lattice.

Second continuous-spin lattice family after the XY rotor (``models/xy.py``):
three-component unit spins, showing the protocol (state pytree with cached
energy + incremental delta-energy moves) extends to vector-valued site state.

Hamiltonian: ``E = -J * sum_<ij> s_i . s_j`` over nearest-neighbour bonds,
``s in S^2``.

Sampling paths:

- :func:`rotation_move` — single-site spin rotation through the generic
  :class:`~montecarlo_tpu.core.moves.MoveDef` protocol: site uniform, rotate
  about a uniformly random axis by ``alpha ~ U[-delta, delta]`` (Rodrigues
  formula).  Symmetric — the reverse move is the same axis with ``-alpha`` at
  equal density — and exactly norm-preserving, so the spins never drift off
  the sphere.  O(1) delta-energy from the four-neighbour local field.
- :class:`CheckerboardHeisenberg` — whole-lattice bipartite Metropolis sweeps
  (even lattices only, same restriction and guard as the Ising/Potts/XY
  checkerboards), each optionally followed by microcanonical over-relaxation
  sweeps: reflect every active-parity spin about its local field,
  ``s -> 2 (s.h) h / |h|^2 - s`` — the O(3) analogue of the XY reflection,
  exactly energy-preserving and rejection-free.

Ground truth: the 2x2 periodic lattice is graph-isomorphic to a 4-ring with
doubled couplings (each torus edge appears twice), and the classical
Heisenberg ring is exactly solvable by the transfer-operator expansion in
Legendre polynomials — ``exp(K s.s') = sum_l (2l+1) i_l(K) P_l(s.s')`` with
``i_l`` the modified spherical Bessel functions — giving
``Z propto sum_l (2l+1) i_l(K)^N`` (:func:`exact_energy_2x2`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.algorithms import DeviceAlgorithm
from ..core.moves import Move, MoveDef, Policy
from ..core.system import SystemDef

__all__ = ["HeisenbergState", "make_system", "init_chains", "rotation_move",
           "AxisAngleRotation",
           "checkerboard_sweep", "overrelax_sweep", "CheckerboardHeisenberg",
           "exact_energy_2x2",
           "callback_energy_per_spin", "callback_magnetisation"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeisenbergState:
    spins: jax.Array   # (L, L, 3) f32 unit vectors
    beta: jax.Array    # ()
    j: jax.Array       # () coupling
    energy: jax.Array  # () cached total energy


def _bond_energy(spins, j):
    """-J * sum of nearest-neighbour dots; roll(+1) per axis counts each
    lattice bond exactly once."""
    return -j * jnp.sum(spins * (jnp.roll(spins, 1, 0)
                                 + jnp.roll(spins, 1, 1)))


def _neighbour_field(spins):
    """Local field h = sum of the four neighbour spins, (L, L, 3)."""
    return (jnp.roll(spins, 1, 0) + jnp.roll(spins, -1, 0)
            + jnp.roll(spins, 1, 1) + jnp.roll(spins, -1, 1))


def _random_unit(key, shape):
    """Uniform points on S^2 via normalised Gaussians, poles-safe."""
    v = jax.random.normal(key, shape + (3,), jnp.float32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)


def _rotate(s, axis, alpha):
    """Rodrigues rotation of ``s`` about unit ``axis`` by ``alpha``;
    broadcasts over leading axes, 3-vectors on the last axis.  The result is
    renormalised so float32 round-off cannot drift spins off the sphere over
    millions of accepted rotations."""
    c = jnp.cos(alpha)[..., None]
    si = jnp.sin(alpha)[..., None]
    dot = jnp.sum(axis * s, axis=-1, keepdims=True)
    r = s * c + jnp.cross(axis, s) * si + axis * dot * (1.0 - c)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-12)


def make_system() -> SystemDef:
    def log_target(state: HeisenbergState):
        return -state.beta * state.energy

    def frame(state: HeisenbergState):
        return {"m": _magnetisation(state.spins), "e": state.energy}

    def format_frame(t, fr):
        return f"{t} {float(fr['m'])!r} {float(fr['e'])!r}"

    return SystemDef(name="Heisenberg2D", log_target=log_target, frame=frame,
                     format_frame=format_frame)


def init_chains(n_chains: int, size: int, beta: float, j: float = 1.0,
                seed: int = 42) -> HeisenbergState:
    key = jax.random.key(seed)
    spins = _random_unit(key, (n_chains, size, size))
    state = HeisenbergState(
        spins=spins,
        beta=jnp.full((n_chains,), beta, jnp.float32),
        j=jnp.full((n_chains,), j, jnp.float32),
        energy=jnp.zeros((n_chains,), jnp.float32),
    )
    energy = jax.vmap(lambda st: _bond_energy(st.spins, st.j))(state)
    return dataclasses.replace(state, energy=energy)


# ---------------------------------------------------------------------------
# Path 1: single-site axis-angle rotation through the generic move protocol
# ---------------------------------------------------------------------------

class AxisAngleRotation(Policy):
    """(site, axis, alpha): site uniform over L², axis uniform on S²,
    ``alpha ~ U[-delta, delta]``.  Symmetric: the inverse action (same axis,
    ``-alpha``) has identical proposal density, so the MH ratio reduces to
    the Boltzmann factor.  ``delta`` is a learnable parameter (its score is
    action-independent, so prefer a fixed width; PGMC-learnable rotation
    widths are covered by the XY family's Gaussian policy)."""

    def sample(self, params, key, state):
        k_site, k_axis, k_ang = jax.random.split(key, 3)
        n = state.spins.shape[0] * state.spins.shape[1]
        site = jax.random.randint(k_site, (), 0, n)
        axis = _random_unit(k_axis, ())
        alpha = params["delta"] * (
            2.0 * jax.random.uniform(k_ang, (), jnp.float32) - 1.0)
        return {"site": site, "axis": axis, "alpha": alpha}

    def log_density(self, params, action, state):
        n = state.spins.shape[0] * state.spins.shape[1]
        # uniform site x uniform axis (constant) x uniform box of width 2 delta
        return (-jnp.log(jnp.asarray(float(n), jnp.float32))
                - jnp.log(2.0 * params["delta"]))


def rotation_move(delta: float, weight: float = 1.0) -> Move:
    def apply(state: HeisenbergState, action):
        sp = state.spins
        lx, ly = sp.shape[:2]
        i, k = action["site"] // ly, action["site"] % ly
        old = sp[i, k]
        new = _rotate(old, action["axis"], action["alpha"])
        h = (sp[(i - 1) % lx, k] + sp[(i + 1) % lx, k]
             + sp[i, (k - 1) % ly] + sp[i, (k + 1) % ly])
        d_e = -state.j * jnp.sum((new - old) * h)
        spins = sp.at[i, k].set(new)
        new_state = dataclasses.replace(
            state, spins=spins, energy=state.energy + d_e)
        return new_state, -state.beta * d_e

    def invert(action, new_state):
        return {"site": action["site"], "axis": action["axis"],
                "alpha": -action["alpha"]}

    def reward(action, new_state):
        return action["alpha"] * action["alpha"]

    md = MoveDef(name="SpinRotation", policy=AxisAngleRotation(), apply=apply,
                 invert=invert, reward=reward, kind="heisenberg_rotation")
    return Move(move=md, params={"delta": jnp.asarray(delta, jnp.float32)},
                weight=weight)


# ---------------------------------------------------------------------------
# Path 2: checkerboard Metropolis + over-relaxation sweeps
# ---------------------------------------------------------------------------

def _parity_mask(lx, ly, parity):
    ii, kk = jnp.meshgrid(jnp.arange(lx), jnp.arange(ly), indexing="ij")
    return ((ii + kk) % 2) == parity


def checkerboard_half_sweep(state: HeisenbergState, parity, delta, key):
    """Metropolis-rotate every site of one sublattice simultaneously.

    Requires even lattice dimensions (periodic odd lattices are not
    bipartite — same restriction and guard as the other checkerboards).
    """
    sp = state.spins
    lx, ly = sp.shape[:2]
    if lx % 2 or ly % 2:
        raise ValueError(
            f"checkerboard sweeps need even lattice dimensions, got "
            f"({lx}, {ly}): the parity mask is not a proper 2-colouring of a "
            f"periodic odd lattice (wrap-around neighbours share a parity)")
    k_axis, k_ang, k_acc = jax.random.split(key, 3)
    mask = _parity_mask(lx, ly, parity)

    axis = _random_unit(k_axis, (lx, ly))
    alpha = delta * (2.0 * jax.random.uniform(
        k_ang, (lx, ly), jnp.float32) - 1.0)
    prop = _rotate(sp, axis, alpha)

    h = _neighbour_field(sp)
    d_e = -state.j * jnp.sum((prop - sp) * h, axis=-1)

    u = jax.random.uniform(k_acc, (lx, ly), jnp.float32)
    accept = mask & (jnp.log(u) < -state.beta * d_e)
    spins = jnp.where(accept[..., None], prop, sp)
    energy = state.energy + jnp.sum(jnp.where(accept, d_e, 0.0))
    new_state = dataclasses.replace(state, spins=spins, energy=energy)
    return new_state, jnp.sum(accept, dtype=jnp.int32)


def checkerboard_sweep(state: HeisenbergState, delta, key):
    k0, k1 = jax.random.split(key)
    state, a0 = checkerboard_half_sweep(state, 0, delta, k0)
    state, a1 = checkerboard_half_sweep(state, 1, delta, k1)
    return state, a0 + a1


def overrelax_half_sweep(state: HeisenbergState, parity):
    """Reflect every active-parity spin about its local field.

    ``s -> 2 (s.h) h / |h|^2 - s`` preserves ``s.h`` (hence the site's
    neighbour energy) and the unit norm exactly; deterministic and PRNG-free.
    Sites with ``|h| ~ 0`` keep their spin (their local energy is constant
    anyway, so skipping them is also energy-preserving).
    """
    sp = state.spins
    lx, ly = sp.shape[:2]
    mask = _parity_mask(lx, ly, parity)
    h = _neighbour_field(sp)
    h2 = jnp.sum(h * h, axis=-1, keepdims=True)
    safe = h2 > 1e-12
    dot = jnp.sum(sp * h, axis=-1, keepdims=True)
    reflected = jnp.where(safe, 2.0 * dot * h / jnp.where(safe, h2, 1.0) - sp,
                          sp)
    spins = jnp.where(mask[..., None], reflected, sp)
    return dataclasses.replace(state, spins=spins)


def overrelax_sweep(state: HeisenbergState):
    state = overrelax_half_sweep(state, 0)
    return overrelax_half_sweep(state, 1)


class CheckerboardHeisenberg(DeviceAlgorithm):
    """DeviceAlgorithm: checkerboard Metropolis + over-relaxation driver.

    Per simulation step: ``sweeps`` x (one Metropolis checkerboard sweep +
    ``overrelax`` over-relaxation sweeps).  Same lifecycle/device-state
    contract as the other lattice drivers (counter-based per-chain RNG
    streams; counters[chain, 0] = (accepted, attempted) over the Metropolis
    attempts only — over-relaxation is rejection-free by construction).
    """

    state_key = "checkerboard_heisenberg"

    def __init__(self, sim, sweeps: int = 1, overrelax: int = 0,
                 delta: float = 1.0, seed: int = 1, dependencies=(), **_):
        self.sweeps = int(sweeps)
        self.overrelax = int(overrelax)
        self.delta = float(delta)
        self.seed = int(seed)
        self.n_chains = sim.n_chains
        spins = sim.chains0.spins
        self.lattice_shape = tuple(int(d) for d in spins.shape[1:3])
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
        io.write("\tCheckerboardHeisenberg\n")
        io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
        io.write(f"\t\tSweeps per step: {self.sweeps}\n")
        io.write(f"\t\tOver-relaxation sweeps per Metropolis sweep: "
                 f"{self.overrelax}\n")
        io.write(f"\t\tRotation half-width delta: {self.delta}\n")
        io.write(f"\t\tLattice: {self.lattice_shape}\n")
        io.write(f"\t\tSeed: {self.seed}\n")


# ---------------------------------------------------------------------------
# Observables + exact ground truth
# ---------------------------------------------------------------------------

def _magnetisation(spins):
    n = spins.shape[-2] * spins.shape[-3]
    m = jnp.sum(spins, axis=(-3, -2)) / n
    return jnp.linalg.norm(m, axis=-1)


def callback_energy_per_spin(view):
    n = view.sys.spins.shape[-2] * view.sys.spins.shape[-3]
    return jnp.mean(view.sys.energy) / n


def callback_magnetisation(view):
    return jnp.mean(_magnetisation(view.sys.spins))


def exact_energy_2x2(beta: float, j: float = 1.0, l_max: int = 60) -> float:
    """Exact mean energy per spin of the 2x2 periodic Heisenberg lattice.

    The 2x2 torus with the roll(+1) bond convention counts every physical
    edge twice, so the model is a 4-ring with coupling ``2 J`` (cycle
    00 -> 01 -> 11 -> 10 -> 00 covers exactly the doubled pairs).  The
    classical Heisenberg ring has the transfer-operator solution

        Z(K) propto sum_l (2l+1) i_l(K)^N,   N = 4, K = 2 beta J,

    with ``i_l`` the modified spherical Bessel functions, and
    ``<E> = -(2 J) d log Z / dK``.  Truncation at ``l_max`` is spectrally
    convergent (``i_l(K)`` decays super-geometrically in ``l`` for fixed K).
    """
    from scipy.special import spherical_in

    n_ring = 4
    k = 2.0 * beta * j
    ls = np.arange(l_max + 1)
    il = spherical_in(ls, k)
    dil = spherical_in(ls, k, derivative=True)
    w = (2 * ls + 1) * il ** n_ring
    z = w.sum()
    dz = ((2 * ls + 1) * n_ring * il ** (n_ring - 1) * dil).sum()
    mean_e_total = -(2.0 * j) * dz / z
    return float(mean_e_total / 4.0)
