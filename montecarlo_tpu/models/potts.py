"""q-state Potts model on a periodic 2-D square lattice.

Third lattice family (after the 1-D/2-D Ising modules), exercising the same
system-agnostic protocol the reference advertises (``README.md:26-31``): a
state pytree with a cached total energy plus moves that return incremental
delta-energies (the ``perform_action_cached!`` idea, ``src/metropolis.jl:119``,
expressed as pure functions).

Hamiltonian: ``E = -J * sum_<ij> delta(s_i, s_j)`` over nearest-neighbour
bonds, spins in ``{0, .., q-1}``.  ``q = 2`` reproduces Ising up to
``E_potts = (E_ising - 2 L^2 J) / 2`` (delta = (1 + s_i s_j)/2).

Two sampling paths, mirroring ``models/ising2d.py``:

- :func:`color_flip_move` — single-site recolouring through the generic
  :class:`~montecarlo_tpu.core.moves.MoveDef` protocol: pick a site uniformly,
  propose one of the other ``q - 1`` colours uniformly (symmetric proposal),
  O(1) delta-energy from the four-neighbour colour counts.
- :func:`checkerboard_sweep` — whole-lattice bipartite Metropolis sweep: all
  sites of one parity are recoloured simultaneously as one fused
  (L, L) vector op (valid because the square lattice is bipartite).

Exact check: :func:`exact_moments` enumerates all ``q^(L^2)`` states for tiny
lattices — a non-statistical ground truth for the tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.moves import Move, MoveDef, Policy
from ..core.system import SystemDef

__all__ = ["PottsState", "make_system", "init_chains", "color_flip_move",
           "checkerboard_sweep", "CheckerboardPotts",
           "wolff_step", "swendsen_wang_step", "WolffPotts",
           "SwendsenWangPotts", "exact_moments",
           "callback_energy_per_spin", "callback_order_parameter"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PottsState:
    spins: jax.Array   # (L, L) int8 colours in {0, .., q-1}
    beta: jax.Array    # ()
    j: jax.Array       # () coupling
    energy: jax.Array  # () cached total energy
    # q is static (move/system constructors close over it): colour counts
    # shape the proposal distribution, so it must be a trace-time constant.


def _bond_matches(spins):
    """Per-site matches with the up and left neighbours (roll(+1) compares
    each site against its predecessor along the axis); summed over the
    lattice this counts every nearest-neighbour bond exactly once."""
    s = spins
    return ((s == jnp.roll(s, 1, axis=0)).astype(jnp.float32)
            + (s == jnp.roll(s, 1, axis=1)).astype(jnp.float32))


def _total_energy(spins, j):
    return -j * jnp.sum(_bond_matches(spins))


def _neighbour_matches(spins, colors):
    """For each site, number of the 4 neighbours equal to ``colors`` (same
    shape as the lattice, any int array broadcastable to it)."""
    s = spins
    return ((jnp.roll(s, 1, 0) == colors).astype(jnp.float32)
            + (jnp.roll(s, -1, 0) == colors).astype(jnp.float32)
            + (jnp.roll(s, 1, 1) == colors).astype(jnp.float32)
            + (jnp.roll(s, -1, 1) == colors).astype(jnp.float32))


def make_system(q: int) -> SystemDef:
    def log_target(state: PottsState):
        return -state.beta * state.energy

    def frame(state: PottsState):
        return {"m": _order_parameter(state.spins, q), "e": state.energy}

    def format_frame(t, fr):
        return f"{t} {float(fr['m'])!r} {float(fr['e'])!r}"

    return SystemDef(name=f"Potts{q}", log_target=log_target, frame=frame,
                     format_frame=format_frame)


def init_chains(n_chains: int, size: int, q: int, beta: float,
                j: float = 1.0, seed: int = 42) -> PottsState:
    key = jax.random.key(seed)
    spins = jax.random.randint(
        key, (n_chains, size, size), 0, q, dtype=jnp.int8)
    state = PottsState(
        spins=spins,
        beta=jnp.full((n_chains,), beta, jnp.float32),
        j=jnp.full((n_chains,), j, jnp.float32),
        energy=jnp.zeros((n_chains,), jnp.float32),
    )
    energy = jax.vmap(lambda st: _total_energy(st.spins, st.j))(state)
    return dataclasses.replace(state, energy=energy)


# ---------------------------------------------------------------------------
# Path 1: single-site recolouring through the generic move protocol
# ---------------------------------------------------------------------------

class UniformRecolor(Policy):
    """(site, new colour) uniform over L² sites × (q-1) other colours.

    Symmetric: q(a'|s) = q(a|s') = 1 / (L² (q-1)), and the inverse action
    (same site, old colour) has the same density — so logq cancels in the
    MH ratio, like the reference example's symmetric Gaussian displacement.
    """

    def __init__(self, q: int):
        self.q = int(q)

    def sample(self, params, key, state):
        k_site, k_col = jax.random.split(key)
        n = state.spins.shape[0] * state.spins.shape[1]
        site = jax.random.randint(k_site, (), 0, n)
        ly = state.spins.shape[1]
        old = state.spins[site // ly, site % ly].astype(jnp.int32)
        r = jax.random.randint(k_col, (), 0, self.q - 1)
        new = r + (r >= old)                 # uniform over colours != old
        return {"site": site, "color": new.astype(jnp.int8)}

    def log_density(self, params, action, state):
        n = state.spins.shape[0] * state.spins.shape[1]
        return -jnp.log(jnp.asarray(float(n * (self.q - 1)), jnp.float32))


def color_flip_move(q: int, weight: float = 1.0) -> Move:
    def apply(state: PottsState, action):
        s = state.spins
        lx, ly = s.shape
        i, k = action["site"] // ly, action["site"] % ly
        old, new = s[i, k], action["color"]
        up, down = s[(i - 1) % lx, k], s[(i + 1) % lx, k]
        left, right = s[i, (k - 1) % ly], s[i, (k + 1) % ly]
        n_old = sum((nb == old).astype(jnp.float32)
                    for nb in (up, down, left, right))
        n_new = sum((nb == new).astype(jnp.float32)
                    for nb in (up, down, left, right))
        d_e = -state.j * (n_new - n_old)
        spins = s.at[i, k].set(new)
        new_state = dataclasses.replace(
            state, spins=spins, energy=state.energy + d_e)
        return new_state, -state.beta * d_e

    def invert(action, new_state):
        ly = new_state.spins.shape[1]
        # inverse = recolour the same site back; the old colour is whatever
        # the pre-move lattice held there — but apply() has already written
        # the new colour, so the inverse action's colour must be carried in
        # the action itself.  The proposal is symmetric and uniform, so any
        # valid colour != current gives the same log-density; use the one
        # that restores the previous lattice.
        i, k = action["site"] // ly, action["site"] % ly
        del i, k
        return action  # density depends only on (n, q): self-inverse in logq

    def reward(action, new_state):
        return jnp.asarray(1.0, jnp.float32)

    md = MoveDef(name="PottsRecolor", policy=UniformRecolor(q), apply=apply,
                 invert=invert, reward=reward, kind="potts_recolor")
    return Move(move=md, params={"dummy": jnp.zeros(())}, weight=weight)


# ---------------------------------------------------------------------------
# Path 2: checkerboard whole-lattice sweeps
# ---------------------------------------------------------------------------

def checkerboard_half_sweep(state: PottsState, q: int, parity, key):
    """Metropolis-recolour every site of one sublattice simultaneously.

    Each site of the active parity draws a uniform proposal among the other
    ``q - 1`` colours and accepts with ``min(1, exp(-beta dE))``; conditioned
    on the frozen sublattice these L²/2 tests are independent.

    Requires even lattice dimensions — on a periodic odd lattice the
    (i+j) % 2 mask puts wrap-around neighbours (e.g. (i, 0) and (i, L-1)) on
    the same sublattice, so simultaneous updates would bias the distribution.
    """
    s = state.spins
    lx, ly = s.shape
    if lx % 2 or ly % 2:
        raise ValueError(
            f"checkerboard sweeps need even lattice dimensions, got "
            f"({lx}, {ly}): the parity mask is not a proper 2-colouring of a "
            f"periodic odd lattice (wrap-around neighbours share a parity)")
    k_col, k_acc = jax.random.split(key)
    ii, kk = jnp.meshgrid(jnp.arange(lx), jnp.arange(ly), indexing="ij")
    mask = ((ii + kk) % 2) == parity

    r = jax.random.randint(k_col, (lx, ly), 0, q - 1, dtype=jnp.int32)
    prop = (r + (r >= s.astype(jnp.int32))).astype(s.dtype)

    d_e = -state.j * (_neighbour_matches(s, prop)
                      - _neighbour_matches(s, s))
    u = jax.random.uniform(k_acc, (lx, ly), jnp.float32)
    accept = mask & (jnp.log(u) < -state.beta * d_e)
    spins = jnp.where(accept, prop, s)
    energy = state.energy + jnp.sum(jnp.where(accept, d_e, 0.0))
    new_state = dataclasses.replace(state, spins=spins, energy=energy)
    return new_state, jnp.sum(accept, dtype=jnp.int32)


def checkerboard_sweep(state: PottsState, q: int, key):
    k0, k1 = jax.random.split(key)
    state, a0 = checkerboard_half_sweep(state, q, 0, k0)
    state, a1 = checkerboard_half_sweep(state, q, 1, k1)
    return state, a0 + a1


def CheckerboardPotts(q: int):
    """DeviceAlgorithm factory: a checkerboard Metropolis driver bound to a
    static ``q`` (colour count shapes the proposal, so it is a compile-time
    constant, not device state).

    Usage: ``dict(algorithm=potts.CheckerboardPotts(3), sweeps=1, seed=...)``.
    """
    from .ising2d import CheckerboardMetropolis

    class _CheckerboardPotts(CheckerboardMetropolis):
        state_key = "checkerboard_potts"

        def step(self, dstate, t):
            slc = dstate[self.state_key]
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(
                slc["keys"], t.astype(jnp.uint32))

            def one_chain(st, key):
                keys = jax.random.split(key, self.sweeps)

                def body(carry, k):
                    st, acc = carry
                    st, a = checkerboard_sweep(st, q, k)
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
            io.write(f"\tCheckerboardPotts(q={q})\n")
            io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
            io.write(f"\t\tLattice sweeps per step: {self.sweeps}\n")
            io.write(f"\t\tLattice: {self.lattice_shape}\n")

    _CheckerboardPotts.__name__ = f"CheckerboardPotts_q{q}"
    return _CheckerboardPotts


# ---------------------------------------------------------------------------
# Path 3: cluster algorithms (Wolff + Swendsen–Wang via FK representation)
# ---------------------------------------------------------------------------

def _active_bonds(state: PottsState, k_right, k_down):
    """Fortuin–Kasteleyn bond activation: same-colour nearest-neighbour bonds
    are active with ``p = 1 - exp(-beta J)`` (note the Potts factor — the
    delta-Hamiltonian bond energy gap is J, not 2J as in Ising)."""
    s = state.spins
    lx, ly = s.shape
    p_bond = 1.0 - jnp.exp(-state.beta * state.j)
    act_right = (s == jnp.roll(s, -1, axis=1)) & (
        jax.random.uniform(k_right, (lx, ly)) < p_bond)
    act_down = (s == jnp.roll(s, -1, axis=0)) & (
        jax.random.uniform(k_down, (lx, ly)) < p_bond)
    return act_right, act_down


def wolff_step(state: PottsState, q: int, key):
    """One Wolff cluster move for the q-state Potts model.

    Grow the FK cluster of a uniformly chosen seed through same-colour bonds
    activated with ``p = 1 - exp(-beta J)``, then recolour the whole cluster
    to one of the other ``q - 1`` colours uniformly.  Rejection-free and
    detailed-balanced (the proposal is symmetric between the old and new
    colourings; the bond weights cancel exactly as in the Ising case).

    Cluster growth is the fused-vector dilation of
    :func:`~montecarlo_tpu.ops.cluster.seed_component_mask` — no sequential
    flood fill.  Returns ``(new_state, cluster_size)``.
    """
    from ..ops.cluster import seed_component_mask

    s = state.spins
    lx, ly = s.shape
    k_seed, k_right, k_down, k_col = jax.random.split(key, 4)
    act_right, act_down = _active_bonds(state, k_right, k_down)

    site = jax.random.randint(k_seed, (), 0, lx * ly)
    mask = seed_component_mask(act_right, act_down, site)

    old = s.reshape(-1)[site].astype(jnp.int32)
    r = jax.random.randint(k_col, (), 0, q - 1)
    new = (r + (r >= old)).astype(s.dtype)      # uniform over colours != old
    spins = jnp.where(mask, new, s)
    energy = _total_energy(spins, state.j)
    new_state = dataclasses.replace(state, spins=spins, energy=energy)
    return new_state, jnp.sum(mask, dtype=jnp.int32)


def swendsen_wang_step(state: PottsState, q: int, key):
    """One Swendsen–Wang sweep for the q-state Potts model.

    Full FK decomposition: activate same-colour bonds with
    ``p = 1 - exp(-beta J)``, label every activated-bond component
    (:func:`~montecarlo_tpu.ops.cluster.component_labels`), and give each
    component an independent uniform colour in ``{0, .., q-1}`` by indexing a
    per-site random colour array with the component id.  Valid on odd
    lattices (no bipartite colouring involved).

    Returns ``(new_state, n_clusters)``.
    """
    from ..ops.cluster import component_labels

    s = state.spins
    lx, ly = s.shape
    k_right, k_down, k_col = jax.random.split(key, 3)
    act_right, act_down = _active_bonds(state, k_right, k_down)
    labels = component_labels(act_right, act_down)

    fresh = jax.random.randint(k_col, (lx * ly,), 0, q, dtype=s.dtype)
    spins = fresh[labels.reshape(-1)].reshape(lx, ly)
    energy = _total_energy(spins, state.j)
    new_state = dataclasses.replace(state, spins=spins, energy=energy)
    own = jnp.arange(lx * ly, dtype=jnp.int32).reshape(lx, ly)
    n_clusters = jnp.sum((labels == own).astype(jnp.int32))
    return new_state, n_clusters


def _check_ferromagnetic(sim, name):
    j = np.asarray(sim.chains0.j)
    if not np.all(j > 0):
        raise ValueError(
            f"{name} requires a ferromagnetic coupling J > 0 on every chain "
            f"(got min J = {j.min()}); the FK bond probability "
            f"1 - exp(-beta J) is only valid for J > 0")


def WolffPotts(q: int):
    """DeviceAlgorithm factory: Wolff cluster driver bound to a static ``q``.

    Usage: ``dict(algorithm=potts.WolffPotts(3), clusters=1, seed=...)``;
    counters[chain, 0] = (total cluster size, clusters flipped), so
    ``ising2d.callback_mean_cluster_size`` works unchanged if pointed at the
    ``wolff`` state slice.
    """
    from .ising2d import WolffCluster

    class _WolffPotts(WolffCluster):
        def __init__(self, sim, clusters: int = 1, seed: int = 1,
                     dependencies=(), **_):
            self.clusters = int(clusters)
            self.seed = int(seed)
            self.n_chains = sim.n_chains
            spins = sim.chains0.spins
            self.lattice_shape = tuple(int(d) for d in spins.shape[1:])
            _check_ferromagnetic(sim, type(self).__name__)

        def step(self, dstate, t):
            slc = dstate[self.state_key]
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(
                slc["keys"], t.astype(jnp.uint32))

            def one_chain(st, key):
                keys = jax.random.split(key, self.clusters)

                def body(carry, k):
                    st, size = carry
                    st, n = wolff_step(st, q, k)
                    return (st, size + n), None

                (st, size), _ = jax.lax.scan(
                    body, (st, jnp.zeros((), jnp.int32)), keys)
                return st, size

            sys, size = jax.vmap(one_chain)(dstate["sys"], step_keys)
            inc = jnp.stack(
                [size, jnp.full_like(size, self.clusters)],
                axis=-1)[:, None, :]
            return {**dstate, "sys": sys,
                    self.state_key: {**slc, "counters": slc["counters"] + inc}}

        def write_summary(self, io, scheduler):
            from ..core.algorithms import _n_calls
            io.write(f"\tWolffPotts(q={q})\n")
            io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
            io.write(f"\t\tCluster flips per step: {self.clusters}\n")
            io.write(f"\t\tLattice: {self.lattice_shape}\n")

    _WolffPotts.__name__ = f"WolffPotts_q{q}"
    return _WolffPotts


def SwendsenWangPotts(q: int):
    """DeviceAlgorithm factory: Swendsen–Wang driver bound to a static ``q``.

    Usage: ``dict(algorithm=potts.SwendsenWangPotts(3), sweeps=1, seed=...)``.
    """
    from .ising2d import SwendsenWang

    class _SwendsenWangPotts(SwendsenWang):
        def __init__(self, sim, sweeps: int = 1, seed: int = 1,
                     dependencies=(), **_):
            self.sweeps = int(sweeps)
            self.seed = int(seed)
            self.n_chains = sim.n_chains
            spins = sim.chains0.spins
            self.lattice_shape = tuple(int(d) for d in spins.shape[1:])
            _check_ferromagnetic(sim, type(self).__name__)

        def step(self, dstate, t):
            slc = dstate[self.state_key]
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(
                slc["keys"], t.astype(jnp.uint32))

            def one_chain(st, key):
                keys = jax.random.split(key, self.sweeps)

                def body(carry, k):
                    st, nc = carry
                    st, n = swendsen_wang_step(st, q, k)
                    return (st, nc + n), None

                (st, nc), _ = jax.lax.scan(
                    body, (st, jnp.zeros((), jnp.int32)), keys)
                return st, nc

            sys, nc = jax.vmap(one_chain)(dstate["sys"], step_keys)
            inc = jnp.stack(
                [nc, jnp.full_like(nc, self.sweeps)], axis=-1)[:, None, :]
            return {**dstate, "sys": sys,
                    self.state_key: {**slc, "counters": slc["counters"] + inc}}

        def write_summary(self, io, scheduler):
            from ..core.algorithms import _n_calls
            io.write(f"\tSwendsenWangPotts(q={q})\n")
            io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
            io.write(f"\t\tLattice sweeps per step: {self.sweeps}\n")
            io.write(f"\t\tLattice: {self.lattice_shape}\n")

    _SwendsenWangPotts.__name__ = f"SwendsenWangPotts_q{q}"
    return _SwendsenWangPotts


# ---------------------------------------------------------------------------
# Observables + exact ground truth
# ---------------------------------------------------------------------------

def _order_parameter(spins, q: int):
    """Potts order parameter m = (q * max_c f_c - 1) / (q - 1) where f_c is
    the fraction of sites in colour c; 0 when disordered, 1 when ordered."""
    n = spins.shape[-1] * spins.shape[-2]
    counts = jnp.stack(
        [jnp.sum(spins == c, axis=(-2, -1)) for c in range(q)], axis=-1)
    fmax = jnp.max(counts, axis=-1).astype(jnp.float32) / n
    return (q * fmax - 1.0) / (q - 1.0)


def callback_energy_per_spin(view):
    n = view.sys.spins.shape[-1] * view.sys.spins.shape[-2]
    return jnp.mean(view.sys.energy) / n


def callback_order_parameter(q: int):
    def cb(view):
        return jnp.mean(_order_parameter(view.sys.spins, q))
    cb.__name__ = "callback_order_parameter"
    return cb


def exact_moments(size: int, q: int, beta: float, j: float = 1.0):
    """Brute-force Boltzmann expectations on an L×L periodic lattice.

    Enumerates all q^(L²) colourings (feasible for q^(L²) ≤ ~2e5), returning
    ``(energy per spin, mean order parameter)``.
    """
    n = size * size
    if q ** n > 300_000:
        raise ValueError("exact enumeration infeasible for this (q, L)")
    idx = np.arange(q ** n, dtype=np.int64)
    digits = np.empty((q ** n, n), np.int8)
    for d in range(n):
        digits[:, d] = idx % q
        idx = idx // q
    s = digits.reshape(-1, size, size)
    matches = ((s == np.roll(s, 1, axis=1)).astype(np.float64)
               + (s == np.roll(s, 1, axis=2)).astype(np.float64))
    e = -j * matches.sum(axis=(1, 2))
    w = np.exp(-beta * (e - e.min()))
    z = w.sum()
    counts = np.stack([(s == c).sum(axis=(1, 2)) for c in range(q)], axis=-1)
    m = (q * counts.max(axis=-1) / n - 1.0) / (q - 1.0)
    return float((w * e).sum() / z / n), float((w * m).sum() / z)
