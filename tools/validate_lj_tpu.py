"""Validate the Pallas LJ displacement sweep against the reference-path
energy bookkeeping.  Run on a TPU host: python tools/validate_lj_tpu.py

Checks:
1. after thousands of hardware-PRNG-driven attempts, the kernel's cached
   energies match a fresh O(N^2) recomputation (the same cache-consistency
   gate as tests/test_lennard_jones.py enforces for the XLA path);
2. chains actually move and acceptance is in a physical range;
3. segmentation invariance: one 400-step call == 4 x 100-step calls.
"""

import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    from montecarlo_tpu.models import lennard_jones as lj
    from montecarlo_tpu.ops.lj_sweep import fused_lj_sweep

    assert jax.default_backend() == "tpu", "run this on a TPU host"
    p = lj.LJParams()
    st = lj.init_chains(16, 48, rho=0.6, beta=1.0, frac_b=0.25, seed=5,
                        params=p)
    box = float(st.box[0])

    t0 = time.time()
    pos, e, acc = fused_lj_sweep(st.pos, st.species, st.beta, st.energy, box,
                                 0.12, 7, 0, 2000, params=p, block_chains=16)
    e_np = np.asarray(e)
    print(f"compile+run: {time.time() - t0:.1f}s")
    st2 = dataclasses.replace(st, pos=pos)
    full = np.asarray(jax.vmap(lambda s: lj.total_energy(s, p))(st2))
    np.testing.assert_allclose(e_np, full, rtol=3e-4, atol=5e-2)
    rate = float(acc.sum()) / (16 * 2000)
    print(f"cache consistent; acceptance {rate:.3f}")
    assert 0.05 < rate < 0.98
    assert not np.allclose(np.asarray(pos), np.asarray(st.pos))

    # segmentation invariance
    pos_a, e_a, acc_a = fused_lj_sweep(
        st.pos, st.species, st.beta, st.energy, box, 0.12, 7, 0, 400,
        params=p, block_chains=16)
    pos_b, e_b, acc_b = st.pos, st.energy, 0
    for k in range(4):
        pos_b, e_b, a = fused_lj_sweep(
            pos_b, st.species, st.beta, e_b, box, 0.12, 7, k * 100, 100,
            params=p, block_chains=16)
        acc_b = acc_b + a
    assert np.array_equal(np.asarray(pos_a), np.asarray(pos_b))
    print("segmentation invariance: exact")

    # mixed displacement + swap kernel (BASELINE config 5)
    from montecarlo_tpu.ops.lj_sweep import fused_lj_mixed_sweep
    pos, spec, e, acc, tot = fused_lj_mixed_sweep(
        st.pos, st.species, st.beta, st.energy, box, 0.12, 0.8, 7, 0, 2000,
        params=p, block_chains=16)
    st3 = dataclasses.replace(st, pos=pos, species=spec)
    full = np.asarray(jax.vmap(lambda s: lj.total_energy(s, p))(st3))
    np.testing.assert_allclose(np.asarray(e), full, rtol=3e-4, atol=5e-2)
    acc, tot = np.asarray(acc), np.asarray(tot)
    assert np.array_equal(np.asarray(st.species).sum(1),
                          np.asarray(spec).sum(1)), "composition not conserved"
    frac = tot[:, 0].sum() / tot.sum()
    print(f"mixed: cache consistent; disp frac {frac:.3f}; "
          f"acc disp {acc[:, 0].sum() / tot[:, 0].sum():.3f} "
          f"swap {acc[:, 1].sum() / tot[:, 1].sum():.3f}")
    assert abs(frac - 0.8) < 0.05
    print("LJ KERNELS VALIDATED")


if __name__ == "__main__":
    main()
