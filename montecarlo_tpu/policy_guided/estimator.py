"""PolicyGradientEstimator — accumulate PGMC gradient estimates.

Rebuild of ``src/PolicyGuided/estimator.jl``.  The reference reduces
``GradientData`` over chains × q_batch with a threaded transducer fold
(``estimator.jl:94,111-134``); here the probe kernel is vmapped over the
q-batch and the chain axis, and the cross-chain reduction is a tree-sum that
XLA lowers to a ``psum`` when the chain axis is sharded over a mesh.

The estimator is *off-policy*: it samples proposals at the current state but
never advances the chains (ref ``gradients.jl:103`` always reverts), so it
composes with Metropolis at the same timestep exactly like the reference's
in-order algorithm list.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.algorithms import DeviceAlgorithm
from ..core.metropolis import Metropolis
from .gradients import add, init_gradient_data, sample_gradient_data
from .learning import PolicyGradient, Static

__all__ = ["PolicyGradientEstimator"]

_PGE_TAG = 0x50474D43  # "PGMC": decorrelates estimator keys from Metropolis


class PolicyGradientEstimator(DeviceAlgorithm):
    state_key = "pge"

    def __init__(self, sim, dependencies=(), optimisers: Sequence[PolicyGradient] = (),
                 q_batch_size: int = 1, **_):
        deps = [d for d in dependencies if isinstance(d, Metropolis)]
        if len(deps) != 1:
            raise ValueError("PolicyGradientEstimator requires a single "
                             "Metropolis dependency")
        self.metropolis = deps[0]
        self.optimisers = tuple(optimisers)
        if len(self.optimisers) != self.metropolis.n_moves:
            raise ValueError("need one optimiser per move in the pool")
        # ref estimator.jl:72 — learnable moves are the non-Static ones
        self.learn_ids = [k for k, o in enumerate(self.optimisers)
                          if not isinstance(o, Static)]
        self.q_batch_size = int(q_batch_size)
        self.seed = self.metropolis.seed
        self.n_chains = sim.n_chains
        self.movedefs = self.metropolis.movedefs
        # flat parameter dimension per learnable move (static at build time)
        self.param_dims = []
        for lid in self.learn_ids:
            flat, _ = ravel_pytree(self.metropolis.pool[lid].params)
            self.param_dims.append(int(flat.shape[0]))
        # Group learnable moves with identical structure so the probe kernel
        # is traced once per *group* and vmapped over the move axis — the
        # reference traces per move (estimator.jl:112); with e.g. 7
        # same-policy moves this cuts trace/compile cost ~6x.
        self._groups = self._build_groups()

    def _build_groups(self):
        def key(lid):
            md = self.movedefs[lid]
            flat, _ = ravel_pytree(self.metropolis.pool[lid].params)
            structural = (md.kind, id(md.aux), type(md.policy),
                          int(flat.shape[0])) if md.kind else ("id", id(md))
            return structural

        groups = {}
        order = []
        for acc_idx, lid in enumerate(self.learn_ids):
            k = key(lid)
            if k not in groups:
                groups[k] = []
                order.append(k)
            groups[k].append((acc_idx, lid))
        return [(self.movedefs[groups[k][0][1]], groups[k]) for k in order]

    def init_state(self, sim):
        base = jax.random.fold_in(jax.random.key(self.seed), _PGE_TAG)
        chain_ids = jnp.arange(self.n_chains, dtype=jnp.uint32)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(base, chain_ids)
        gd = tuple(init_gradient_data(p) for p in self.param_dims)
        obj = jnp.zeros((len(self.learn_ids),), jnp.float32)
        return {"keys": keys, "gd": gd, "obj": obj}

    def step(self, dstate, t):
        slc = dstate[self.state_key]
        gds = list(slc["gd"])
        obj = slc["obj"]
        sum0 = lambda x: jnp.sum(x, axis=0)
        for md, members in self._groups:
            params_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[dstate[self.metropolis.params_key][lid]
                  for _, lid in members])
            lids = jnp.asarray([lid for _, lid in members], jnp.uint32)

            def per_move(params_one, lid, md=md):
                def per_chain(state, base_key):
                    k = jax.random.fold_in(
                        jax.random.fold_in(base_key, t.astype(jnp.uint32)),
                        lid)
                    ks = jax.random.split(k, self.q_batch_size)
                    batch = jax.vmap(lambda kk: sample_gradient_data(
                        md, params_one, state, kk))(ks)
                    return jax.tree_util.tree_map(sum0, batch)

                per = jax.vmap(per_chain)(dstate["sys"], slc["keys"])
                # chain reduction: lowered to psum across shards under a mesh
                return jax.tree_util.tree_map(sum0, per)

            gd_stack = jax.vmap(per_move)(params_stack, lids)
            for j, (acc_idx, _) in enumerate(members):
                gd_j = jax.tree_util.tree_map(lambda x: x[j], gd_stack)
                gds[acc_idx] = add(gds[acc_idx], gd_j)
                obj = obj.at[acc_idx].set(
                    gds[acc_idx].j / gds[acc_idx].n.astype(gds[acc_idx].j.dtype))
        return {**dstate, self.state_key: {**slc, "gd": tuple(gds),
                                           "obj": obj}}

    def write_summary(self, io, scheduler):
        from ..core.algorithms import _n_calls
        io.write("\tPolicyGradientEstimator\n")
        io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
        io.write(f"\t\tLearnable moves: {[k + 1 for k in self.learn_ids]}\n")
        io.write(f"\t\tQ batch size: {self.q_batch_size}\n")
        io.write("\t\tAD backend: jax.grad\n")
        io.write(f"\t\tSeed: {self.seed}\n")
        io.write(f"\t\tDevices: {jax.device_count()}\n")
