"""1-D Ising ring with single-spin-flip Metropolis moves.

Demonstrates the protocol on a *discrete* system (the reference is
system-agnostic by design — ``README.md:26-31``): state is a spin vector with
cached energy, the move flips one uniformly-chosen site, and the delta-energy
is the local bond sum — O(1) per attempt.

Exact check: the periodic-ring energy per spin is
``-J (t + t^{N-1}) / (1 + t^N)`` with ``t = tanh(beta J)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.moves import Move, MoveDef, Policy
from ..core.system import SystemDef

__all__ = ["IsingState", "make_system", "init_chains", "spin_flip_move",
           "exact_energy_per_spin", "callback_energy_per_spin",
           "callback_magnetisation"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IsingState:
    spins: jax.Array   # (N,) int8 in {-1, +1}
    beta: jax.Array    # ()
    j: jax.Array       # () coupling
    energy: jax.Array  # () cached total energy


def _total_energy(spins, j):
    return -j * jnp.sum(spins * jnp.roll(spins, 1))


def make_system() -> SystemDef:
    def log_target(state: IsingState):
        return -state.beta * state.energy

    def frame(state: IsingState):
        return {"m": jnp.mean(state.spins.astype(jnp.float32)),
                "e": state.energy}

    def format_frame(t, fr):
        return f"{t} {float(fr['m'])!r} {float(fr['e'])!r}"

    return SystemDef(name="Ising1D", log_target=log_target, frame=frame,
                     format_frame=format_frame)


def init_chains(n_chains: int, n_spins: int, beta: float, j: float = 1.0,
                seed: int = 42) -> IsingState:
    key = jax.random.key(seed)
    spins = jax.random.bernoulli(key, 0.5, (n_chains, n_spins))
    spins = (2 * spins.astype(jnp.int8) - 1)
    state = IsingState(
        spins=spins,
        beta=jnp.full((n_chains,), beta, jnp.float32),
        j=jnp.full((n_chains,), j, jnp.float32),
        energy=jnp.zeros((n_chains,), jnp.float32),
    )
    energy = jax.vmap(lambda s: _total_energy(
        s.spins.astype(jnp.float32), s.j))(state)
    return dataclasses.replace(state, energy=energy)


class UniformSiteFlip(Policy):
    """Pick a site uniformly; proposal is symmetric/self-inverse."""

    def sample(self, params, key, state):
        n = state.spins.shape[0]
        return jax.random.randint(key, (), 0, n)

    def log_density(self, params, action, state):
        n = state.spins.shape[0]
        return -jnp.log(jnp.asarray(float(n), jnp.float32))


def spin_flip_move(weight: float = 1.0) -> Move:
    def apply(state: IsingState, site):
        s = state.spins
        n = s.shape[0]
        left = s[(site - 1) % n].astype(jnp.float32)
        right = s[(site + 1) % n].astype(jnp.float32)
        si = s[site].astype(jnp.float32)
        d_e = 2.0 * state.j * si * (left + right)
        spins = s.at[site].set(-s[site])
        new_state = dataclasses.replace(
            state, spins=spins, energy=state.energy + d_e)
        return new_state, -state.beta * d_e

    def invert(site, new_state):
        return site  # self-inverse

    def reward(site, new_state):
        return jnp.asarray(1.0, jnp.float32)

    md = MoveDef(name="SpinFlip", policy=UniformSiteFlip(), apply=apply,
                 invert=invert, reward=reward, kind="ising_spin_flip")
    return Move(move=md, params={"dummy": jnp.zeros(())}, weight=weight)


def exact_energy_per_spin(beta: float, n: int, j: float = 1.0) -> float:
    """Exact periodic-ring mean energy per spin at inverse temperature
    beta (transfer-matrix result)."""
    t = np.tanh(beta * j)
    return float(-j * (t + t ** (n - 1)) / (1.0 + t ** n))


def callback_energy_per_spin(view):
    n = view.sys.spins.shape[-1]
    return jnp.mean(view.sys.energy) / n


def callback_magnetisation(view):
    return jnp.mean(jnp.abs(
        jnp.mean(view.sys.spins.astype(jnp.float32), axis=-1)))
