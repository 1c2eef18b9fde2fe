"""PolicyGradientUpdate — consume accumulated gradients, update parameters.

Rebuild of ``src/PolicyGuided/update.jl``.  The reference mutates the shared
(aliased-across-chains) parameter arrays in place (``update.jl:50-57``); here
the update returns a new replicated ``params`` tuple inside device state, so
every chain sees the new proposal distribution at the next step — broadcast
replaces aliasing (SURVEY §3.4).

Decoupled schedules work exactly as upstream: schedule the estimator E times
per update call and the accumulated ``GradientData`` (a monoid) is averaged
here, then reset (``update.jl:52-54``).
"""

from __future__ import annotations

from jax.flatten_util import ravel_pytree

from ..core.algorithms import DeviceAlgorithm
from .estimator import PolicyGradientEstimator
from .gradients import average, init_gradient_data
from .learning import learning_step

__all__ = ["PolicyGradientUpdate"]


class PolicyGradientUpdate(DeviceAlgorithm):
    state_key = "pgu"

    def __init__(self, sim, dependencies=(), **_):
        deps = [d for d in dependencies
                if isinstance(d, PolicyGradientEstimator)]
        if len(deps) != 1:
            raise ValueError("PolicyGradientUpdate requires a single "
                             "PolicyGradientEstimator dependency")
        self.estimator = deps[0]
        self.optimisers = self.estimator.optimisers
        self.learn_ids = self.estimator.learn_ids

    def init_state(self, sim):
        return ()

    def step(self, dstate, t):
        est = self.estimator
        slc = dstate[est.state_key]
        pkey = est.metropolis.params_key
        params = list(dstate[pkey])
        gds = list(slc["gd"])
        for idx, lid in enumerate(self.learn_ids):
            gd_avg = average(gds[idx])
            flat, unravel = ravel_pytree(params[lid])
            new_flat = learning_step(self.optimisers[lid], flat, gd_avg)
            params[lid] = unravel(new_flat)
            gds[idx] = init_gradient_data(est.param_dims[idx])
        return {**dstate, pkey: tuple(params),
                est.state_key: {**slc, "gd": tuple(gds)}}

    def write_summary(self, io, scheduler):
        from ..core.algorithms import _n_calls
        io.write("\tPolicyGradientUpdate\n")
        io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")
        io.write(f"\t\tLearnable moves: {[k + 1 for k in self.learn_ids]}\n")
        io.write("\t\tOptimisers:\n")
        for k, opt in enumerate(self.optimisers):
            io.write(f"\t\t\tMove {k + 1}: {opt!r}\n")
