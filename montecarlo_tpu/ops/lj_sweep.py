"""Pallas fused sweep for 2-D Lennard-Jones displacement moves.

The XLA path for N-body MC is per-attempt-op-overhead bound (each MH attempt
is a handful of small vector ops inside a scan). This kernel keeps a block of
chains' positions resident in VMEM for the entire segment and performs each
attempt as ~40 wide vector ops over (B_chains, N) arrays:

- particle pick / proposal / accept randomness from the hardware PRNG,
  re-seeded per absolute step (segment-invariant, like ``fused_sweep.py``);
- dynamic gather of the chosen particle via one-hot multiply-reduce, update
  via masked select (no serialised gathers/scatters);
- truncated-shifted LJ rows computed with reciprocals only — no
  transcendentals in the energy path;
- binary-mixture support via arithmetic species selects (Kob-Andersen
  tables).

Matches the semantics of ``models/lennard_jones.lj_displacement_move`` with a
symmetric Gaussian proposal (logq terms cancel; acceptance = log u < -beta
ΔE).  The RNG stream is block-indexed (not chain-indexed), so trajectories
differ from the generic path while sampling the same distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sweep import _hash32, make_draw

__all__ = ["fused_lj_sweep"]

_LANES = 128


def _uniform(bits):
    f = jax.lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f  # (0, 1]


def _kernel(n_particles, hw_prng, scalars_ref, seed_ref, t0_ref, nsteps_ref,
            x_ref, y_ref, spc_ref, beta_ref, e_ref,
            x_out, y_out, e_out, acc_out):
    (sigma, box, inv_box, e_aa, e_ab, e_bb, s2_aa, s2_ab, s2_bb,
     rc2_aa, rc2_ab, rc2_bb, sh_aa, sh_ab, sh_bb) = [
        scalars_ref[k] for k in range(15)]
    b = x_ref.shape[0]
    n = n_particles
    pid = pl.program_id(0)

    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    beta = beta_ref[:, 0:1]                      # (B, 1)

    def pair_tables(spc, s_i):
        """(eps, sig^2, rc^2, shift) rows for species pair (s_i, spc_j)."""
        same = spc == s_i
        is_a = s_i == 0.0

        def sel(aa, ab, bb):
            return jnp.where(same, jnp.where(is_a, aa, bb), ab)

        return (sel(e_aa, e_ab, e_bb), sel(s2_aa, s2_ab, s2_bb),
                sel(rc2_aa, rc2_ab, rc2_bb), sel(sh_aa, sh_ab, sh_bb))

    def row_energy(x, y, spc, xi, yi, s_i, self_mask):
        dx = x - xi
        dy = y - yi
        dx = dx - box * jnp.round(dx * inv_box)
        dy = dy - box * jnp.round(dy * inv_box)
        r2 = dx * dx + dy * dy
        eps, s2, rc2, shift = pair_tables(spc, s_i)
        inv = s2 * pl.reciprocal(jnp.maximum(r2, 1e-12), approx=False)
        i6 = inv * inv * inv
        u = 4.0 * eps * (i6 * i6 - i6) - shift
        u = jnp.where((r2 < rc2) & jnp.logical_not(self_mask), u, 0.0)
        return jnp.sum(u, axis=1, keepdims=True)     # (B, 1)

    def body(k, carry):
        x, y, e, acc = carry
        step_seed = (_hash32(seed_ref[0] + t0_ref[0] + k)
                     + pid * jnp.int32(1000003))
        bits = make_draw(hw_prng, step_seed, (b, _LANES))(0)
        u_pick = _uniform(bits[:, 0:1])              # (B, 1)
        u1 = _uniform(bits[:, 1:2])
        u2 = _uniform(bits[:, 2:3])
        u_acc = _uniform(bits[:, 3:4])

        i_sel = jnp.minimum((u_pick * n).astype(jnp.int32),
                            n - 1)                   # (B, 1)
        onehot = (col == i_sel)                      # (B, N) bool
        oh_f = onehot.astype(jnp.float32)
        spc = spc_ref[:, :]
        xi = jnp.sum(x * oh_f, axis=1, keepdims=True)
        yi = jnp.sum(y * oh_f, axis=1, keepdims=True)
        s_i = jnp.sum(spc * oh_f, axis=1, keepdims=True)

        r = sigma * jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        dx_p = r * jnp.cos(theta)
        dy_p = r * jnp.sin(theta)
        xn = xi + dx_p
        yn = yi + dy_p

        e_old = row_energy(x, y, spc, xi, yi, s_i, onehot)
        e_new = row_energy(x, y, spc, xn, yn, s_i, onehot)
        d_e = e_new - e_old                          # (B, 1)

        accept = jnp.log(u_acc) < -beta * d_e        # (B, 1)
        upd = onehot & accept                        # (B, N)
        xn_w = xn - box * jnp.floor(xn * inv_box)    # wrap into [0, box)
        yn_w = yn - box * jnp.floor(yn * inv_box)
        x = jnp.where(upd, xn_w, x)
        y = jnp.where(upd, yn_w, y)
        e = e + jnp.where(accept, d_e, 0.0)
        acc = acc + accept.astype(jnp.int32)
        return x, y, e, acc

    x0 = x_ref[:, :]
    y0 = y_ref[:, :]
    e0 = e_ref[:, 0:1]
    acc0 = jnp.zeros((b, 1), jnp.int32)
    x, y, e, acc = jax.lax.fori_loop(0, nsteps_ref[0], body,
                                     (x0, y0, e0, acc0))
    x_out[:, :] = x
    y_out[:, :] = y
    e_out[:, :] = jnp.broadcast_to(e, (b, _LANES))
    acc_out[:, :] = jnp.broadcast_to(acc, (b, _LANES))


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                             "block_chains"))
def fused_lj_sweep(pos, species, beta, energy, box, sigma, seed, t0, n_steps,
                   *, params, interpret=False, block_chains=256):
    """Run ``n_steps`` LJ displacement attempts per chain in one kernel.

    Args:
      pos: (M, N, 2) float32 positions.
      species: (M, N) int32 labels (0/1).
      beta: (M,) float32; energy: (M,) float32 cached totals.
      box: python float or scalar — periodic box edge.
      sigma: scalar traced proposal width.
      seed, t0, n_steps: traced int32 scalars (per-absolute-step seeding).
      params: static LJParams (Kob-Andersen tables).

    Returns:
      (pos', energy', accepted) — accepted is (M,) int32 for this segment.
    """
    m, n, _ = pos.shape
    bc = min(block_chains, max(8, m))
    m_pad = -(-m // bc) * bc
    grid = m_pad // bc

    def pad(a, fill=0):
        out = jnp.full((m_pad,) + a.shape[1:], fill, a.dtype)
        return out.at[:m].set(a)

    x = pad(pos[:, :, 0])
    y = pad(pos[:, :, 1])
    spc = pad(species).astype(jnp.float32)
    # padded chains run with beta=0 (always accept, harmless, discarded)
    bta = jnp.zeros((m_pad, _LANES), jnp.float32).at[:m, 0].set(beta)
    erg = jnp.zeros((m_pad, _LANES), jnp.float32).at[:m, 0].set(energy)

    eps = np.asarray(params.eps, np.float32)
    sig = np.asarray(params.sig, np.float32)
    rc = float(params.rcut)

    def shift(e, s):
        ic6 = (1.0 / rc) ** 6
        return 4.0 * e * (ic6 * ic6 - ic6)

    box_f = jnp.asarray(box, jnp.float32)
    consts = jnp.asarray(
        [eps[0, 0], eps[0, 1], eps[1, 1],
         sig[0, 0] ** 2, sig[0, 1] ** 2, sig[1, 1] ** 2,
         (rc * sig[0, 0]) ** 2, (rc * sig[0, 1]) ** 2, (rc * sig[1, 1]) ** 2,
         shift(eps[0, 0], sig[0, 0]), shift(eps[0, 1], sig[0, 1]),
         shift(eps[1, 1], sig[1, 1])], jnp.float32)
    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(sigma, jnp.float32), box_f, 1.0 / box_f]),
        consts])

    kernel = functools.partial(_kernel, n, not interpret)
    blk = lambda: pl.BlockSpec((bc, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((bc, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    x_o, y_o, e_o, acc_o = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_steps
            blk(), blk(), blk(), tile(), tile(),
        ],
        out_specs=(blk(), blk(), tile(), tile()),
        interpret=interpret,
    )(
        scalars,
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(t0, jnp.int32).reshape(1),
        jnp.asarray(n_steps, jnp.int32).reshape(1),
        x, y, spc, bta, erg,
    )
    pos_out = jnp.stack([x_o[:m], y_o[:m]], axis=-1)
    return pos_out, e_o[:m, 0], acc_o[:m, 0]
