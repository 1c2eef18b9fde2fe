"""Pallas fused Metropolis sweep for 1-D scalar systems.

Speed-of-light path for the BASELINE.json headline config (particle-1d
harmonic, 10^4 chains): the entire chain population stays resident in VMEM
for a whole multi-step segment, with hardware PRNG, Box–Muller Gaussian
proposals, and log-space acceptance — one kernel launch per recorder segment
instead of one XLA step per Metropolis sweep.

Semantically equivalent to the generic `mc_step` path for a single symmetric
Gaussian displacement move (the logq forward/backward terms of
``src/metropolis.jl:183`` cancel exactly for this policy, so the acceptance
rule reduces to ``log u < Δlogp``); the random stream differs (TPU hardware
PRNG vs threefry), which changes individual trajectories but not the sampled
distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_gaussian_sweep"]

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES


def _uniform_from_bits(bits):
    """uint32 bits -> float32 uniform in (0, 1].

    Mantissa trick: force exponent to [1,2), subtract from 2.0 so the result
    is in (0, 1] (safe for log)."""
    f = jax.lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def _hash32(s):
    """Murmur3-style finalizer: decorrelates adjacent per-step seeds."""
    s = s * jnp.int32(-2048144789)          # 0x85EBCA6B
    s = s ^ jax.lax.shift_right_logical(s, 13)
    s = s * jnp.int32(-1028477387)          # 0xC2B2AE35
    s = s ^ jax.lax.shift_right_logical(s, 16)
    return s


def software_bits(step_seed, draw, shape):
    """Counter-based uint32 bits in pure jnp — the interpret-mode stand-in
    for the TPU hardware PRNG (``pltpu.prng_seed`` has no interpret-mode
    lowering).  Two murmur-finalizer rounds over (seed, draw index, lane
    index); a different stream than the hardware PRNG, which is fine — the
    kernel's statistical contract, not its bit stream, is what tests pin."""
    import numpy as _np
    cols = shape[-1]
    flat = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * cols
            + jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1))
    h = flat * jnp.int32(-1640531527) + step_seed        # 0x9E3779B9
    # wrap the static draw tag through uint32 (draw >= 3 would overflow a
    # direct jnp.int32(...) construction)
    tag = int(_np.uint32(draw * 0x3243F6A9).view(_np.int32))
    h = _hash32(h ^ jnp.int32(tag))
    h = _hash32(h + jnp.int32(draw))
    return jax.lax.bitcast_convert_type(h, jnp.uint32)


def make_draw(hw_prng: bool, step_seed, shape):
    """Per-step random-bit source: ``draw(k)`` -> uint32 array of ``shape``.

    Hardware path seeds the TPU PRNG once per step and pulls sequential
    blocks; software path (interpret mode / CPU CI) hashes (seed, k, lane).
    The hardware stream is positional (block order), NOT a function of
    ``k`` — so the closure ENFORCES at trace time (``k`` is always a static
    python int) that callers request strictly sequential fresh indices
    ``0, 1, 2, ...``: a reused or reordered index would silently return
    different bits on CI (interpret/software mode, where ``draw(k)`` IS a
    pure function of ``k``) than on real TPU.  Trace-time assertion = zero
    runtime cost in the PRNG-bound kernels (a per-draw re-seed measured a
    ~6% throughput hit on the headline Gaussian sweep).
    """
    if hw_prng:
        expected = [0]

        def draw(k):
            if k != expected[0]:
                raise ValueError(
                    f"make_draw(hardware): draw index {k} requested but the "
                    f"sequential stream is at {expected[0]} — hardware "
                    f"draws are positional; request fresh indices 0, 1, 2, "
                    f"... per make_draw closure")
            expected[0] += 1
            if k == 0:
                pltpu.prng_seed(step_seed)
            return pltpu.bitcast(
                pltpu.prng_random_bits(shape), jnp.uint32)
        return draw
    return lambda k: software_bits(step_seed, k, shape)


def _sweep_kernel(potential, hw_prng, gridded, seed_ref, t0_ref, nsteps_ref,
                  x_ref, beta_ref, sigma_ref, x_out, e_out, acc_out):
    sigma = sigma_ref[0]
    beta = beta_ref[:]
    shape = x_ref.shape
    pid = pl.program_id(0) if gridded else jnp.int32(0)
    n_steps = nsteps_ref[0]
    t0 = t0_ref[0]
    t_end = t0 + n_steps
    # pairs are aligned to ABSOLUTE micro-steps (2p, 2p+1), so trajectories
    # stay invariant to how recorder schedules slice the run into segments
    # — a segment starting mid-pair masks the pair's first half
    p0 = t0 >> 1
    n_pairs = jnp.where(n_steps > 0, ((t_end - 1) >> 1) - p0 + 1, 0)

    def body(j, carry):
        """TWO MH steps per iteration: Box–Muller yields a PAIR of exact
        independent standard normals (the cos and sin halves of the same
        draws), so a double-step costs 4 PRNG blocks instead of 6 — the
        kernel is PRNG-bound, making this a ~1.3x throughput lever."""
        x, acc = carry
        p = p0 + j
        # Re-seed per absolute pair index (counter-based, like the generic
        # path's fold_in(t)); the chain-block index is folded in (pid = 0
        # when the population fits one block).
        draw = make_draw(
            hw_prng,
            _hash32(seed_ref[0] + p) + pid * jnp.int32(1000003),
            shape)
        u1 = _uniform_from_bits(draw(0))
        u2 = _uniform_from_bits(draw(1))
        u3 = _uniform_from_bits(draw(2))
        u4 = _uniform_from_bits(draw(3))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        z1 = r * jnp.cos(theta)
        z2 = r * jnp.sin(theta)

        live1 = (2 * p >= t0) & (2 * p < t_end)
        xn = x + sigma * z1
        accept = live1 & (jnp.log(u3) < beta * (potential(x)
                                                - potential(xn)))
        x = jnp.where(accept, xn, x)
        acc = acc + accept.astype(jnp.int32)

        live2 = 2 * p + 1 < t_end
        xn = x + sigma * z2
        accept = live2 & (jnp.log(u4) < beta * (potential(x)
                                                - potential(xn)))
        x = jnp.where(accept, xn, x)
        acc = acc + accept.astype(jnp.int32)
        return x, acc

    x, acc = jax.lax.fori_loop(
        0, n_pairs, body, (x_ref[:], jnp.zeros(shape, jnp.int32)))
    x_out[:] = x
    e_out[:] = potential(x)
    acc_out[:] = acc


@functools.partial(jax.jit, static_argnames=("potential", "interpret",
                                             "block_rows"))
def fused_gaussian_sweep(x, beta, sigma, seed, t0, n_steps, *, potential,
                         interpret=False, block_rows=2048):
    """Run ``n_steps`` Metropolis sweeps of a Gaussian displacement move over
    all chains inside one Pallas kernel.

    Populations larger than one VMEM-resident block are tiled over a chain-
    block grid (``block_rows`` sublane rows = ``block_rows * 128`` chains per
    block, ~few MB of VMEM per array), with the block index folded into the
    per-step seed; a single-block population (pid 0) keeps the exact stream
    of the ungridded kernel.

    Args:
      x: (M,) float32 positions.
      beta: (M,) float32 inverse temperatures.
      sigma: scalar proposal width (traced).
      seed: int32 scalar base PRNG seed (traced).
      t0: int32 scalar absolute step offset — step k uses seed
        ``hash(seed + t0 + k)``, making results segmentation-invariant.
      n_steps: int32 scalar number of MH steps (traced; dynamic trip count).
      potential: static elementwise callable U(x).

    Returns:
      (x', e', accepted) with accepted: (M,) int32 acceptance counts for this
      segment.
    """
    m = x.shape[0]
    m_pad = -(-m // _TILE) * _TILE
    rows = m_pad // _LANES
    br = min(block_rows, rows)
    rows_pad = -(-rows // br) * br
    grid = rows_pad // br
    m_pad = rows_pad * _LANES
    xp = jnp.zeros((m_pad,), x.dtype).at[:m].set(x).reshape(rows_pad, _LANES)
    bp = jnp.zeros((m_pad,), beta.dtype).at[:m].set(beta).reshape(
        rows_pad, _LANES)

    kernel = functools.partial(_sweep_kernel, potential, not interpret,
                               grid > 1)
    if grid == 1:
        # single-block fast path: whole-array VMEM residency, no grid
        # machinery — the exact original kernel (pid = 0)
        blk = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        grid_kw = {}
    else:
        blk = lambda: pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        grid_kw = {"grid": (grid,)}
    x_out, e_out, acc = pl.pallas_call(
        kernel,
        **grid_kw,
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t0
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_steps
            blk(),                                   # x
            blk(),                                   # beta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sigma
        ],
        out_specs=(blk(), blk(), blk()),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(t0, jnp.int32).reshape(1),
        jnp.asarray(n_steps, jnp.int32).reshape(1),
        xp, bp,
        jnp.asarray(sigma, jnp.float32).reshape(1),
    )
    flat = lambda a: a.reshape(-1)[:m]
    return flat(x_out), flat(e_out), flat(acc)


def _shard_seed(axis, seed):
    """Fold the shard index into the PRNG seed (one stream per shard) —
    shared by every sharded fused kernel (gaussian/LJ/poly)."""
    sidx = jax.lax.axis_index(axis)
    return seed + (sidx.astype(jnp.int32) + 1) * jnp.int32(-1640531527)


def sharded_gaussian_sweep(mesh, axis, x, beta, sigma, seed, t0, n_steps, *,
                           potential, interpret=False):
    """Multi-device fused sweep: each shard runs the VMEM-resident kernel on
    its local chains under ``shard_map``, with the shard index folded into
    the PRNG seed so shards draw independent streams.

    Reproducible for a fixed mesh layout; unlike the generic per-chain
    fold_in path, the hardware-PRNG stream is block-indexed, so results
    depend on the shard count (documented trade-off of the fast path).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(x_l, beta_l, sigma_l, seed_l, t0_l, n_l):
        return fused_gaussian_sweep(x_l, beta_l, sigma_l,
                                    _shard_seed(axis, seed_l), t0_l,
                                    n_l, potential=potential,
                                    interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(), P(), P()),
                   out_specs=(P(axis), P(axis), P(axis)),
                   check_vma=False)
    return fn(x, beta, jnp.asarray(sigma, jnp.float32),
              jnp.asarray(seed, jnp.int32), jnp.asarray(t0, jnp.int32),
              jnp.asarray(n_steps, jnp.int32))
