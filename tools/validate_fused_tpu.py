"""Validate the fused Pallas sweep against analytics + the generic engine.

Run on a TPU host:  python tools/validate_fused_tpu.py

Checks (particle-1d harmonic, beta=2):
1. Sampled moments from the fused kernel match the analytic target
   (mean 0, std 1/sqrt(2*beta)) at reference-test tolerances.
2. Acceptance rate agrees between the fused kernel and the generic
   threefry path (same physics, different RNG stream).
3. Segmentation invariance: one 20k-step call == 20 x 1k-step calls
   bit-for-bit (per-step absolute-time seeding).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from montecarlo_tpu.ops.fused_sweep import fused_gaussian_sweep
    from montecarlo_tpu.models.particle1d import harmonic

    assert jax.default_backend() == "tpu", "run this on a TPU host"
    M = 20_000
    beta = 2.0
    x = jnp.zeros((M,), jnp.float32)
    b = jnp.full((M,), beta, jnp.float32)

    # 1. moments
    x1, e1, acc = fused_gaussian_sweep(x, b, 0.5, 7, 0, 20_000,
                                       potential=harmonic)
    xs = np.asarray(x1)
    mu, sig = xs.mean(), xs.std()
    tgt = 1 / np.sqrt(2 * beta)
    print(f"mean={mu:+.5f} (tol 4e-3)  std={sig:.5f} vs {tgt:.5f}")
    assert abs(mu) < 4e-3 and abs(sig - tgt) < 4e-3

    # 2. acceptance vs generic engine
    import montecarlo_tpu as mc
    from montecarlo_tpu.models import particle1d as p1d
    from montecarlo_tpu.core.simulation import _make_advance
    chains = p1d.init_chains(M, beta=beta, seed=1)
    sim = mc.Simulation(p1d.make_system(), chains,
                        [dict(algorithm=mc.Metropolis,
                              pool=(p1d.displacement_move(0.5),), seed=1)],
                        4000, path="/tmp/val_fused")
    ds = sim.init_device_state()
    adv = jax.jit(_make_advance(sim.device_algos))
    out = adv(ds, (jnp.ones(4001, bool),), 4000)
    cnt = np.asarray(out["metropolis"]["counters"])
    acc_generic = cnt[..., 0].sum() / cnt[..., 1].sum()
    acc_fused = float(acc.sum()) / (M * 20_000)
    print(f"acceptance fused={acc_fused:.4f} generic={acc_generic:.4f}")
    assert abs(acc_fused - acc_generic) < 5e-3

    # 3. segmentation invariance
    xa, _, aa = fused_gaussian_sweep(x, b, 0.5, 7, 0, 20_000,
                                     potential=harmonic)
    xb, ab = x, jnp.zeros((M,), jnp.int32)
    for k in range(20):
        xb, _, a = fused_gaussian_sweep(xb, b, 0.5, 7, k * 1000, 1000,
                                        potential=harmonic)
        ab = ab + a
    assert np.array_equal(np.asarray(xa), np.asarray(xb)), \
        "segmentation changed the trajectory"
    assert np.array_equal(np.asarray(aa), np.asarray(ab))
    print("segmentation invariance: exact")
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
