"""Pallas fused sweep for polydisperse soft-sphere swap Monte Carlo.

The glass-equilibration workload (``models/polydisperse.py``: continuous
polydispersity, non-additive cross diameters, C2-smoothed IPL-12) on the
VMEM-resident fast path: a block of chains' positions AND diameters stay in
VMEM for a whole segment; each attempt is ~40 wide vector ops over
(B_chains, N) arrays.  Same architecture as ``lj_sweep._mixed_kernel``:

- block-shared per-step move-kind draw (displacement w.p. ``w_disp``, else
  diameter swap) via ``lax.cond`` — each step pays only its branch;
- displacement: uniform pick + Gaussian proposal, O(N) row dE;
- swap: a uniform unordered pair with j != i (the generic ``UniformPair``
  convention), diameters exchanged, 4 row passes for dE — the i-j pair
  term is invariant (sigma_ij symmetric) and cancels;
- per-move acceptance counters, per-absolute-step seeding (segmentation-
  invariant), ``shard_map`` wrapper for chain meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sweep import _hash32, _shard_seed, make_draw
from .lj_sweep import _uniform, _pad_chains

__all__ = ["fused_poly_mixed_sweep", "sharded_poly_mixed_sweep"]

_LANES = 128


def _poly_kernel(n_particles, hw_prng, scalars_ref, seed_ref, t0_ref,
                 nsteps_ref, x_ref, y_ref, dia_ref, beta_ref, e_ref,
                 x_out, y_out, dia_out, e_out, acc_out, tot_out):
    (sigma, box, inv_box, eps_na, xc2, c0, c2, c4, w_disp) = [
        scalars_ref[k] for k in range(9)]
    b = x_ref.shape[0]
    n = n_particles
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    beta = beta_ref[:, 0:1]
    pid = pl.program_id(0)

    def row_energy(x, y, dia, xi, yi, d_i, excl_mask):
        dx = x - xi
        dy = y - yi
        dx = dx - box * jnp.round(dx * inv_box)
        dy = dy - box * jnp.round(dy * inv_box)
        r2 = dx * dx + dy * dy
        sig = 0.5 * (d_i + dia) * (1.0 - eps_na * jnp.abs(d_i - dia))
        s2 = sig * sig
        x2 = r2 * pl.reciprocal(jnp.maximum(s2, 1e-12), approx=False)
        inv2 = pl.reciprocal(jnp.maximum(x2, 1e-12), approx=False)
        i6 = inv2 * inv2 * inv2
        u = i6 * i6 + c0 + c2 * x2 + c4 * x2 * x2
        u = jnp.where((x2 < xc2) & jnp.logical_not(excl_mask), u, 0.0)
        return jnp.sum(u, axis=1, keepdims=True)

    def pick(u_pick):
        i_sel = jnp.minimum((u_pick * n).astype(jnp.int32), n - 1)
        return col == i_sel                          # (B, N) one-hot

    def disp_branch(args):
        step_seed, x, y, dia, e = args
        bits = make_draw(hw_prng, step_seed, (b, _LANES))(0)
        oh = pick(_uniform(bits[:, 0:1]))
        u1 = _uniform(bits[:, 1:2])
        u2 = _uniform(bits[:, 2:3])
        u_acc = _uniform(bits[:, 3:4])
        oh_f = oh.astype(jnp.float32)
        xi = jnp.sum(x * oh_f, axis=1, keepdims=True)
        yi = jnp.sum(y * oh_f, axis=1, keepdims=True)
        d_i = jnp.sum(dia * oh_f, axis=1, keepdims=True)

        r = sigma * jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        xn = xi + r * jnp.cos(theta)
        yn = yi + r * jnp.sin(theta)

        d_e = (row_energy(x, y, dia, xn, yn, d_i, oh)
               - row_energy(x, y, dia, xi, yi, d_i, oh))
        accept = jnp.log(u_acc) < -beta * d_e
        upd = oh & accept
        x = jnp.where(upd, xn - box * jnp.floor(xn * inv_box), x)
        y = jnp.where(upd, yn - box * jnp.floor(yn * inv_box), y)
        e = e + jnp.where(accept, d_e, 0.0)
        return x, y, dia, e, accept.astype(jnp.int32)

    def swap_branch(args):
        step_seed, x, y, dia, e = args
        bits = make_draw(hw_prng, step_seed ^ jnp.int32(0x51AB), (b, _LANES))(0)
        # uniform unordered pair with j != i (matches the generic
        # UniformPair policy: j drawn over the other n-1 indices)
        i_sel = jnp.minimum(
            (_uniform(bits[:, 0:1]) * n).astype(jnp.int32), n - 1)
        j_raw = jnp.minimum(
            (_uniform(bits[:, 1:2]) * (n - 1)).astype(jnp.int32), n - 2)
        j_sel = j_raw + (j_raw >= i_sel).astype(jnp.int32)
        oh_i = col == i_sel
        oh_j = col == j_sel
        u_acc = _uniform(bits[:, 2:3])
        oh_ij = oh_i | oh_j
        oh_i_f = oh_i.astype(jnp.float32)
        oh_j_f = oh_j.astype(jnp.float32)
        x_i = jnp.sum(x * oh_i_f, axis=1, keepdims=True)
        y_i = jnp.sum(y * oh_i_f, axis=1, keepdims=True)
        x_j = jnp.sum(x * oh_j_f, axis=1, keepdims=True)
        y_j = jnp.sum(y * oh_j_f, axis=1, keepdims=True)
        d_i = jnp.sum(dia * oh_i_f, axis=1, keepdims=True)
        d_j = jnp.sum(dia * oh_j_f, axis=1, keepdims=True)

        e_old = (row_energy(x, y, dia, x_i, y_i, d_i, oh_ij)
                 + row_energy(x, y, dia, x_j, y_j, d_j, oh_ij))
        e_new = (row_energy(x, y, dia, x_i, y_i, d_j, oh_ij)
                 + row_energy(x, y, dia, x_j, y_j, d_i, oh_ij))
        d_e = e_new - e_old
        accept = jnp.log(u_acc) < -beta * d_e
        upd = accept
        dia = jnp.where(upd & oh_i & jnp.logical_not(oh_j),
                        jnp.broadcast_to(d_j, dia.shape),
                        jnp.where(upd & oh_j & jnp.logical_not(oh_i),
                                  jnp.broadcast_to(d_i, dia.shape), dia))
        e = e + jnp.where(accept, d_e, 0.0)
        return x, y, dia, e, accept.astype(jnp.int32)

    def body(k, carry):
        x, y, dia, e, acc, tot = carry
        step_seed = (_hash32(seed_ref[0] + t0_ref[0] + k)
                     + pid * jnp.int32(1000003))
        kind_bits = _hash32(step_seed ^ jnp.int32(0x7AB1E5)) & jnp.int32(
            0x7FFFFFFF)
        u_kind = kind_bits.astype(jnp.float32) * jnp.float32(2.0 ** -31)
        is_disp = u_kind < w_disp

        x, y, dia, e, accepted = jax.lax.cond(
            is_disp, disp_branch, swap_branch, (step_seed, x, y, dia, e))
        kind_onehot = jnp.stack(
            [is_disp.astype(jnp.int32), 1 - is_disp.astype(jnp.int32)])
        acc = acc + accepted * kind_onehot[None, :]
        tot = tot + kind_onehot[None, :]
        return x, y, dia, e, acc, tot

    x, y, dia, e, acc, tot = jax.lax.fori_loop(
        0, nsteps_ref[0], body,
        (x_ref[:, :], y_ref[:, :], dia_ref[:, :], e_ref[:, 0:1],
         jnp.zeros((b, 2), jnp.int32), jnp.zeros((b, 2), jnp.int32)))
    x_out[:, :] = x
    y_out[:, :] = y
    dia_out[:, :] = dia
    e_out[:, :] = jnp.broadcast_to(e, (b, _LANES))
    acc_out[:, :] = jnp.pad(acc, ((0, 0), (0, _LANES - 2)))
    tot_out[:, :] = jnp.pad(tot, ((0, 0), (0, _LANES - 2)))


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                             "block_chains"))
def fused_poly_mixed_sweep(pos, diam, beta, energy, box, sigma, w_disp,
                           seed, t0, n_steps, *, params, interpret=False,
                           block_chains=256):
    """``n_steps`` mixed displacement/diameter-swap attempts per chain in
    one kernel.

    Args:
      pos: (M, N, 2) float32; diam: (M, N) float32 diameters.
      params: static :class:`~montecarlo_tpu.models.polydisperse.PolyParams`.
      (others as ``lj_sweep.fused_lj_mixed_sweep``)

    Returns:
      ``(pos', diam', energy', accepted, attempted)`` with counters (M, 2)
      int32 — column 0 displacement, column 1 swap.
    """
    m, n, _ = pos.shape
    bc = min(block_chains, max(8, m))
    m_pad, x, y, dia, bta, erg = _pad_chains(m, bc, pos, diam, beta, energy)
    grid = m_pad // bc
    c0, c2, c4 = params.coeffs()
    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(box, jnp.float32),
                   1.0 / jnp.asarray(box, jnp.float32)]),
        jnp.asarray([params.eps, params.xc ** 2, c0, c2, c4], jnp.float32),
        jnp.asarray(w_disp, jnp.float32).reshape(1)])

    kernel = functools.partial(_poly_kernel, n, not interpret)
    blk = lambda: pl.BlockSpec((bc, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((bc, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    x_o, y_o, dia_o, e_o, acc_o, tot_o = pl.pallas_call(
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
        x, y, dia, bta, erg,
    )
    pos_out = jnp.stack([x_o[:m], y_o[:m]], axis=-1)
    return (pos_out, dia_o[:m], e_o[:m, 0],
            acc_o[:m, 0:2], tot_o[:m, 0:2])


def sharded_poly_mixed_sweep(mesh, axis, pos, diam, beta, energy, box,
                             sigma, w_disp, seed, t0, n_steps, *, params,
                             interpret=False, block_chains=256):
    """Multi-device fused polydisperse swap sweep under ``shard_map``."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(pos_l, dia_l, beta_l, erg_l, box_l, sigma_l, w_l, seed_l,
              t0_l, n_l):
        return fused_poly_mixed_sweep(
            pos_l, dia_l, beta_l, erg_l, box_l, sigma_l, w_l,
            _shard_seed(axis, seed_l), t0_l, n_l, params=params,
            interpret=interpret, block_chains=block_chains)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis),
                             P(), P(), P(), P(), P(), P()),
                   out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return fn(pos, diam, beta, energy, jnp.asarray(box, jnp.float32),
              jnp.asarray(sigma, jnp.float32),
              jnp.asarray(w_disp, jnp.float32),
              jnp.asarray(seed, jnp.int32), jnp.asarray(t0, jnp.int32),
              jnp.asarray(n_steps, jnp.int32))
