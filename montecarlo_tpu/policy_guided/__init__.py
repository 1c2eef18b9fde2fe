"""Policy-guided Monte Carlo (PGMC): adaptive proposal parameters.

Rebuild of the reference sub-module ``src/PolicyGuided/`` with a single AD
backend (``jax.grad``) replacing ForwardDiff/Enzyme/Zygote.  Export surface
mirrors ``src/PolicyGuided/PolicyGuided.jl:20-21``.
"""

from .gradients import (GradientData, add, average, init_gradient_data,
                        pgmc_estimate, sample_gradient_data)
from .learning import (ANPG, BLANPG, BLAPG, BLPG, NPG, VPG, PolicyGradient,
                       Static, learning_step)
from .estimator import PolicyGradientEstimator
from .update import PolicyGradientUpdate

__all__ = [
    "GradientData", "add", "average", "init_gradient_data",
    "pgmc_estimate", "sample_gradient_data",
    "PolicyGradient", "Static", "VPG", "BLPG", "BLAPG", "NPG", "ANPG",
    "BLANPG", "learning_step",
    "PolicyGradientEstimator", "PolicyGradientUpdate",
]
