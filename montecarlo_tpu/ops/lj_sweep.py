"""Pallas fused sweeps for 2-D Lennard-Jones move pools.

The XLA path for N-body MC is per-attempt-op-overhead bound (each MH attempt
is a handful of small vector ops inside a scan).  These kernels keep a block
of chains' positions resident in VMEM for the entire segment and perform each
attempt as ~40 wide vector ops over (B_chains, N) arrays:

- particle pick / proposal / accept randomness from the hardware PRNG,
  re-seeded per absolute step (segment-invariant, like ``fused_sweep.py``);
- dynamic gather of the chosen particle via one-hot multiply-reduce, update
  via masked select (no serialised gathers/scatters);
- truncated-shifted LJ rows computed with reciprocals only — no
  transcendentals in the energy path;
- binary-mixture support via arithmetic species selects (Kob-Andersen
  tables).

Two kernels:

- :func:`fused_lj_sweep` — single displacement move (matches
  ``models/lennard_jones.lj_displacement_move``; symmetric Gaussian proposal,
  logq terms cancel, acceptance = log u < -beta dE).
- :func:`fused_lj_mixed_sweep` — the BASELINE config-5 mixed pool
  ``(displacement, swap)`` (ref mixed-pool sweeps, ``src/metropolis.jl:203-212``).
  The move kind is drawn per step *per chain block* (one scalar categorical
  draw shared by the block's chains, i.i.d. across steps), so each step pays
  only its own branch's bandwidth via ``lax.cond`` instead of computing both
  branches under a per-chain select.  Each chain still sees an i.i.d.
  random kind sequence with the pool's weights — a valid mixture kernel with
  the same invariant distribution; kind draws are merely correlated across
  chains of a block, which touches no per-chain stationarity property.
  The swap branch picks one A and one B particle uniformly (Gumbel-max over
  masked uniforms — no cumsums/gathers) and exchanges their species labels;
  composition is conserved, the proposal is self-inverse, and the
  (A, B)-pair count is constant, so logq cancels exactly as in
  ``models/lennard_jones.UniformPairSwap``.

The RNG stream is block-indexed (not chain-indexed), so trajectories differ
from the generic path while sampling the same distribution.  Sharded wrappers
(:func:`sharded_lj_sweep`, :func:`sharded_lj_mixed_sweep`) run the kernel per
shard under ``shard_map`` with the shard index folded into the seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sweep import _hash32, _shard_seed, make_draw

__all__ = [
    "fused_lj_sweep",
    "fused_lj_mixed_sweep",
    "sharded_lj_sweep",
    "sharded_lj_mixed_sweep",
]

_LANES = 128


def _uniform(bits):
    f = jax.lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f  # (0, 1]


def _make_row_energy(scalars, box, inv_box):
    """Row-energy closure over the (eps, sig^2, rc^2, shift) species tables.

    ``row_energy(x, y, spc, xi, yi, s_i, excl_mask)`` returns the (B, 1)
    interaction energy of a virtual particle at (xi, yi) with species ``s_i``
    against all rows, excluding ``excl_mask`` slots.
    """
    (e_aa, e_ab, e_bb, s2_aa, s2_ab, s2_bb,
     rc2_aa, rc2_ab, rc2_bb, sh_aa, sh_ab, sh_bb) = scalars

    def pair_tables(spc, s_i):
        same = spc == s_i
        is_a = s_i == 0.0

        def sel(aa, ab, bb):
            return jnp.where(same, jnp.where(is_a, aa, bb), ab)

        return (sel(e_aa, e_ab, e_bb), sel(s2_aa, s2_ab, s2_bb),
                sel(rc2_aa, rc2_ab, rc2_bb), sel(sh_aa, sh_ab, sh_bb))

    def row_energy(x, y, spc, xi, yi, s_i, excl_mask):
        dx = x - xi
        dy = y - yi
        dx = dx - box * jnp.round(dx * inv_box)
        dy = dy - box * jnp.round(dy * inv_box)
        r2 = dx * dx + dy * dy
        eps, s2, rc2, shift = pair_tables(spc, s_i)
        inv = s2 * pl.reciprocal(jnp.maximum(r2, 1e-12), approx=False)
        i6 = inv * inv * inv
        u = 4.0 * eps * (i6 * i6 - i6) - shift
        u = jnp.where((r2 < rc2) & jnp.logical_not(excl_mask), u, 0.0)
        return jnp.sum(u, axis=1, keepdims=True)     # (B, 1)

    return row_energy


def _pick_masked(col, mask, u, n):
    """One-hot of a uniform pick among ``mask`` slots (Gumbel-max: argmax of
    uniforms over the masked set, lowest index breaking float ties)."""
    score = jnp.where(mask, u, -1.0)                 # u in (0, 1]
    m = jnp.max(score, axis=1, keepdims=True)
    cand = (score == m) & mask
    idx = jnp.where(cand, col, n)
    i_sel = jnp.min(idx, axis=1, keepdims=True)
    return col == i_sel                              # (B, N) one-hot (bool)


# ---------------------------------------------------------------------------
# Displacement-only kernel
# ---------------------------------------------------------------------------

def _kernel(n_particles, hw_prng, scalars_ref, seed_ref, t0_ref, nsteps_ref,
            x_ref, y_ref, spc_ref, beta_ref, e_ref,
            x_out, y_out, e_out, acc_out):
    sigma, box, inv_box = (scalars_ref[0], scalars_ref[1], scalars_ref[2])
    row_energy = _make_row_energy(
        [scalars_ref[k] for k in range(3, 15)], box, inv_box)
    b = x_ref.shape[0]
    n = n_particles

    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    beta = beta_ref[:, 0:1]                      # (B, 1)
    pid = pl.program_id(0)

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


# ---------------------------------------------------------------------------
# Mixed displacement + swap kernel (BASELINE config 5)
# ---------------------------------------------------------------------------

def _mixed_kernel(n_particles, hw_prng, scalars_ref, seed_ref, t0_ref,
                  nsteps_ref, x_ref, y_ref, spc_ref, beta_ref, e_ref,
                  x_out, y_out, spc_out, e_out, acc_out, tot_out):
    sigma, box, inv_box = (scalars_ref[0], scalars_ref[1], scalars_ref[2])
    w_disp = scalars_ref[15]
    row_energy = _make_row_energy(
        [scalars_ref[k] for k in range(3, 15)], box, inv_box)
    b = x_ref.shape[0]
    n = n_particles

    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    beta = beta_ref[:, 0:1]                      # (B, 1)
    pid = pl.program_id(0)

    def disp_branch(args):
        step_seed, x, y, spc, e = args
        bits = make_draw(hw_prng, step_seed, (b, _LANES))(0)
        u_pick = _uniform(bits[:, 0:1])
        u1 = _uniform(bits[:, 1:2])
        u2 = _uniform(bits[:, 2:3])
        u_acc = _uniform(bits[:, 3:4])

        i_sel = jnp.minimum((u_pick * n).astype(jnp.int32), n - 1)
        onehot = (col == i_sel)
        oh_f = onehot.astype(jnp.float32)
        xi = jnp.sum(x * oh_f, axis=1, keepdims=True)
        yi = jnp.sum(y * oh_f, axis=1, keepdims=True)
        s_i = jnp.sum(spc * oh_f, axis=1, keepdims=True)

        r = sigma * jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        xn = xi + r * jnp.cos(theta)
        yn = yi + r * jnp.sin(theta)

        e_old = row_energy(x, y, spc, xi, yi, s_i, onehot)
        e_new = row_energy(x, y, spc, xn, yn, s_i, onehot)
        d_e = e_new - e_old

        accept = jnp.log(u_acc) < -beta * d_e
        upd = onehot & accept
        xn_w = xn - box * jnp.floor(xn * inv_box)
        yn_w = yn - box * jnp.floor(yn * inv_box)
        x = jnp.where(upd, xn_w, x)
        y = jnp.where(upd, yn_w, y)
        e = e + jnp.where(accept, d_e, 0.0)
        return x, y, spc, e, accept.astype(jnp.int32)

    def swap_branch(args):
        step_seed, x, y, spc, e = args
        # two (B, N) uniform planes for the A/B picks + one accept column
        draw_n = make_draw(hw_prng, step_seed ^ jnp.int32(0x5CA1AB1E),
                           (b, n))
        ua = _uniform(draw_n(0))
        ub = _uniform(draw_n(1))
        u_acc = _uniform(
            make_draw(hw_prng, step_seed ^ jnp.int32(0x0ACCE97), (b, _LANES))
            (0)[:, 0:1])

        is_b = spc > 0.5
        oh_i = _pick_masked(col, jnp.logical_not(is_b), ua, n)   # an A slot
        oh_j = _pick_masked(col, is_b, ub, n)                    # a B slot
        oh_ij = oh_i | oh_j
        oh_i_f = oh_i.astype(jnp.float32)
        oh_j_f = oh_j.astype(jnp.float32)
        # a mono-species chain has one empty one-hot: its "partner" would be
        # a phantom particle at the origin — reject the attempt outright
        valid = (jnp.sum(oh_i_f, axis=1, keepdims=True) > 0.0) \
            & (jnp.sum(oh_j_f, axis=1, keepdims=True) > 0.0)
        x_i = jnp.sum(x * oh_i_f, axis=1, keepdims=True)
        y_i = jnp.sum(y * oh_i_f, axis=1, keepdims=True)
        x_j = jnp.sum(x * oh_j_f, axis=1, keepdims=True)
        y_j = jnp.sum(y * oh_j_f, axis=1, keepdims=True)

        zero = jnp.zeros((b, 1), jnp.float32)
        one = jnp.ones((b, 1), jnp.float32)
        # identity exchange: i (A -> B), j (B -> A); the i-j pair term is
        # symmetric under the exchange and cancels in dE
        e_old = (row_energy(x, y, spc, x_i, y_i, zero, oh_ij)
                 + row_energy(x, y, spc, x_j, y_j, one, oh_ij))
        e_new = (row_energy(x, y, spc, x_i, y_i, one, oh_ij)
                 + row_energy(x, y, spc, x_j, y_j, zero, oh_ij))
        d_e = e_new - e_old

        accept = valid & (jnp.log(u_acc) < -beta * d_e)
        upd = accept
        spc = jnp.where(upd & oh_i, 1.0, jnp.where(upd & oh_j, 0.0, spc))
        e = e + jnp.where(accept, d_e, 0.0)
        return x, y, spc, e, accept.astype(jnp.int32)

    def body(k, carry):
        x, y, spc, e, acc, tot = carry
        step_seed = (_hash32(seed_ref[0] + t0_ref[0] + k)
                     + pid * jnp.int32(1000003))
        # block-shared scalar kind draw (i.i.d. across steps): displacement
        # with probability w_disp, else swap.  int32 arithmetic only (Mosaic
        # has no uint32 -> float32 cast): mask the sign bit for a uniform
        # draw over [0, 2^31).
        kind_bits = _hash32(step_seed ^ jnp.int32(0x7AB1E5)) & jnp.int32(
            0x7FFFFFFF)
        u_kind = kind_bits.astype(jnp.float32) * jnp.float32(2.0 ** -31)
        is_disp = u_kind < w_disp

        x, y, spc, e, accepted = jax.lax.cond(
            is_disp, disp_branch, swap_branch, (step_seed, x, y, spc, e))
        kind_onehot = jnp.stack(
            [is_disp.astype(jnp.int32), 1 - is_disp.astype(jnp.int32)])
        acc = acc + accepted * kind_onehot[None, :]      # (B, 2)
        tot = tot + kind_onehot[None, :]                 # (B, 2)
        return x, y, spc, e, acc, tot

    x0 = x_ref[:, :]
    y0 = y_ref[:, :]
    spc0 = spc_ref[:, :]
    e0 = e_ref[:, 0:1]
    acc0 = jnp.zeros((b, 2), jnp.int32)
    tot0 = jnp.zeros((b, 2), jnp.int32)
    x, y, spc, e, acc, tot = jax.lax.fori_loop(
        0, nsteps_ref[0], body, (x0, y0, spc0, e0, acc0, tot0))
    x_out[:, :] = x
    y_out[:, :] = y
    spc_out[:, :] = spc
    e_out[:, :] = jnp.broadcast_to(e, (b, _LANES))
    acc_out[:, :] = jnp.pad(acc, ((0, 0), (0, _LANES - 2)))
    tot_out[:, :] = jnp.pad(tot, ((0, 0), (0, _LANES - 2)))


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _lj_scalars(params, box, sigma, w_disp=1.0):
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
    return jnp.concatenate([
        jnp.stack([jnp.asarray(sigma, jnp.float32), box_f, 1.0 / box_f]),
        consts,
        jnp.asarray(w_disp, jnp.float32).reshape(1)])


def _pad_chains(m, bc, pos, species, beta, energy):
    m_pad = -(-m // bc) * bc

    def pad(a, fill=0):
        out = jnp.full((m_pad,) + a.shape[1:], fill, a.dtype)
        return out.at[:m].set(a)

    x = pad(pos[:, :, 0])
    y = pad(pos[:, :, 1])
    spc = pad(species).astype(jnp.float32)
    # padded chains run with beta=0 (always accept, harmless, discarded)
    bta = jnp.zeros((m_pad, _LANES), jnp.float32).at[:m, 0].set(beta)
    erg = jnp.zeros((m_pad, _LANES), jnp.float32).at[:m, 0].set(energy)
    return m_pad, x, y, spc, bta, erg


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
    m_pad, x, y, spc, bta, erg = _pad_chains(m, bc, pos, species, beta,
                                             energy)
    grid = m_pad // bc
    scalars = _lj_scalars(params, box, sigma)

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


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                             "block_chains"))
def fused_lj_mixed_sweep(pos, species, beta, energy, box, sigma, w_disp,
                         seed, t0, n_steps, *, params, interpret=False,
                         block_chains=256):
    """Run ``n_steps`` mixed displacement/swap attempts per chain in one
    kernel (BASELINE config 5; ref mixed pools ``src/metropolis.jl:203-212``).

    Args:
      w_disp: scalar traced probability of drawing the displacement move
        (``weight_disp / (weight_disp + weight_swap)``).
      (others as :func:`fused_lj_sweep`)

    Returns:
      ``(pos', species', energy', accepted, attempted)`` with accepted and
      attempted (M, 2) int32 — column 0 displacement, column 1 swap.
    """
    m, n, _ = pos.shape
    bc = min(block_chains, max(8, m))
    m_pad, x, y, spc, bta, erg = _pad_chains(m, bc, pos, species, beta,
                                             energy)
    grid = m_pad // bc
    scalars = _lj_scalars(params, box, sigma, w_disp)

    kernel = functools.partial(_mixed_kernel, n, not interpret)
    blk = lambda: pl.BlockSpec((bc, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((bc, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    x_o, y_o, spc_o, e_o, acc_o, tot_o = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_steps
            blk(), blk(), blk(), tile(), tile(),
        ],
        out_specs=(blk(), blk(), blk(), tile(), tile(), tile()),
        interpret=interpret,
    )(
        scalars,
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(t0, jnp.int32).reshape(1),
        jnp.asarray(n_steps, jnp.int32).reshape(1),
        x, y, spc, bta, erg,
    )
    pos_out = jnp.stack([x_o[:m], y_o[:m]], axis=-1)
    species_out = spc_o[:m].astype(species.dtype)
    return (pos_out, species_out, e_o[:m, 0],
            acc_o[:m, 0:2], tot_o[:m, 0:2])


# ---------------------------------------------------------------------------
# shard_map wrappers (chain-axis sharding, block-indexed shard streams)
# ---------------------------------------------------------------------------

def sharded_lj_sweep(mesh, axis, pos, species, beta, energy, box, sigma,
                     seed, t0, n_steps, *, params, interpret=False,
                     block_chains=256):
    """Multi-device fused LJ displacement sweep: each shard runs the
    VMEM-resident kernel on its local chains under ``shard_map``, with the
    shard index folded into the PRNG seed (mirrors
    ``fused_sweep.sharded_gaussian_sweep``)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(pos_l, spc_l, beta_l, erg_l, box_l, sigma_l, seed_l, t0_l,
              n_l):
        return fused_lj_sweep(
            pos_l, spc_l, beta_l, erg_l, box_l, sigma_l,
            _shard_seed(axis, seed_l), t0_l, n_l, params=params,
            interpret=interpret, block_chains=block_chains)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis),
                             P(), P(), P(), P(), P()),
                   out_specs=(P(axis), P(axis), P(axis)),
                   check_vma=False)
    return fn(pos, species, beta, energy, jnp.asarray(box, jnp.float32),
              jnp.asarray(sigma, jnp.float32),
              jnp.asarray(seed, jnp.int32), jnp.asarray(t0, jnp.int32),
              jnp.asarray(n_steps, jnp.int32))


def sharded_lj_mixed_sweep(mesh, axis, pos, species, beta, energy, box,
                           sigma, w_disp, seed, t0, n_steps, *, params,
                           interpret=False, block_chains=256):
    """Multi-device fused mixed displacement/swap sweep under ``shard_map``
    — the BASELINE config-5 path on a pod slice."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(pos_l, spc_l, beta_l, erg_l, box_l, sigma_l, w_l, seed_l,
              t0_l, n_l):
        return fused_lj_mixed_sweep(
            pos_l, spc_l, beta_l, erg_l, box_l, sigma_l, w_l,
            _shard_seed(axis, seed_l), t0_l, n_l, params=params,
            interpret=interpret, block_chains=block_chains)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis),
                             P(), P(), P(), P(), P(), P()),
                   out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return fn(pos, species, beta, energy, jnp.asarray(box, jnp.float32),
              jnp.asarray(sigma, jnp.float32),
              jnp.asarray(w_disp, jnp.float32),
              jnp.asarray(seed, jnp.int32), jnp.asarray(t0, jnp.int32),
              jnp.asarray(n_steps, jnp.int32))
