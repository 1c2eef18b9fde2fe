"""Checkerboard cell-list Monte Carlo for large-N 2-D particle systems.

The O(N)-per-move row kernels (``lj_sweep.py``) cap particle MC at N ~ 10^3:
every attempt touches all N rows and attempts are sequential.  This module
implements the massively-parallel alternative (the cell decomposition of
Anderson, Lechner & Glotzer's checkerboard GPU MC, re-derived TPU-first):

- The box is divided into an ``nc x nc`` grid of cells (``nc`` even, >= 4)
  of width ``w >= rcut + 2 * d_cap``.
- Cells are 4-colored in a 2x2 checkerboard.  In one *substep*, every cell
  of one color proposes a move for ONE uniformly-picked occupant.  Two
  active cells are never adjacent, and every particle stays within
  ``d_cap`` of its *storage cell* (moves that would leave the cell's
  ``+/- d_cap`` halo are rejected — a symmetric proposal-set restriction
  that preserves detailed balance), so simultaneous moves are provably
  non-interacting and each substep is a product of independent MH updates:
  pi-invariant by the standard checkerboard argument.
- A particle's interactions always lie inside its 3x3 cell neighbourhood:
  any partner within ``rcut`` of a position in cell +/- d_cap sits within
  boundary distance ``rcut + 2 d_cap <= w`` of the cell, i.e. in an
  adjacent cell.  Neighbour access is 9 static torus rolls of the
  ``(nc, nc, C)`` cell arrays — no gathers, no sorts inside the hot loop.
- Between segments, particles are re-binned (one argsort per chain),
  restoring full ergodicity; within a segment the anchor constraint makes
  re-binning unnecessary by construction.

Per substep ~``nc^2/4`` moves execute in parallel per chain; the tensors are
wide enough (``(B, nc, nc, C)``) that plain XLA amortises per-op overhead —
no Pallas needed, and chain-axis sharding falls out of vmap + sharding
propagation.  Throughput per move is O(9C) instead of O(N): independent of
N at fixed density.

Capability target: ParticlesMC-scale systems (N = 10^4+) the reference
organisation's ecosystem runs (``/root/reference/README.md:33``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["CellGrid", "plan_grid", "bind_cells", "unbind_cells",
           "cell_mc_segment"]

_NEIGH = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


class CellGrid:
    """Static cell-decomposition plan (python-level; hashable)."""

    def __init__(self, nc: int, cap: int, box: float, d_cap: float):
        self.nc = int(nc)
        self.cap = int(cap)
        self.box = float(box)
        self.w = self.box / self.nc
        self.d_cap = float(d_cap)

    def __repr__(self):
        return (f"CellGrid(nc={self.nc}, cap={self.cap}, box={self.box}, "
                f"d_cap={self.d_cap})")

    def __hash__(self):
        return hash((self.nc, self.cap, self.box, self.d_cap))

    def __eq__(self, other):
        return (isinstance(other, CellGrid)
                and (self.nc, self.cap, self.box, self.d_cap)
                == (other.nc, other.cap, other.box, other.d_cap))


def plan_grid(n_particles: int, box: float, rcut: float,
              d_cap: float = 0.45, cap_slack: float = 2.0) -> CellGrid:
    """Choose the largest even cell grid with ``w >= rcut + 2 d_cap``.

    ``cap`` (slots per cell) is the mean occupancy times ``cap_slack``,
    rounded up to a multiple of 8 — binding asserts it is never exceeded.
    Returns None-equivalent raise if the box only fits a grid smaller than
    4x4 (cell MC needs >= 4 cells per axis so the 9 torus rolls are
    distinct cells).
    """
    nc = int(box / (rcut + 2.0 * d_cap))
    nc -= nc % 2
    if nc < 4:
        raise ValueError(
            f"box {box:.3g} too small for cell MC with rcut {rcut} and "
            f"d_cap {d_cap}: need >= 4 cells per axis")
    mean_occ = n_particles / (nc * nc)
    cap = max(8, int(math.ceil(mean_occ * cap_slack / 8.0)) * 8)
    return CellGrid(nc=nc, cap=cap, box=box, d_cap=d_cap)


# ---------------------------------------------------------------------------
# Binding: flat (N, ...) particle arrays <-> (nc, nc, C) cell arrays
# ---------------------------------------------------------------------------

def bind_cells(grid: CellGrid, pos, attr):
    """Bin ONE chain's particles into cell slots.

    Args:
      pos: (N, 2) positions in [0, box).
      attr: (N,) per-particle attribute (species label / diameter).

    Returns dict of (nc, nc, C) arrays: ``x``, ``y``, ``attr``, ``occ``
    (bool occupancy) and ``idx`` (original particle index, N where empty),
    plus ``overflow`` — a scalar bool flagging any cell fuller than C
    (checked by the caller; the segment is invalid if set).
    """
    n = pos.shape[0]
    nc, cap = grid.nc, grid.cap
    inv_w = nc / grid.box
    cx = jnp.clip((pos[:, 0] * inv_w).astype(jnp.int32), 0, nc - 1)
    cy = jnp.clip((pos[:, 1] * inv_w).astype(jnp.int32), 0, nc - 1)
    cid = cy * nc + cx
    order = jnp.argsort(cid, stable=True)
    cid_s = cid[order]
    r = jnp.arange(n)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_new, r, 0))
    rank = r - seg_start
    overflow = jnp.any(rank >= cap)
    slot = cid_s * cap + jnp.minimum(rank, cap - 1)

    def scatter(src, fill, dtype=None):
        out = jnp.full((nc * nc * cap,), fill,
                       src.dtype if dtype is None else dtype)
        return out.at[slot].set(src[order]).reshape(nc, nc, cap)

    return {
        "x": scatter(pos[:, 0], 0.0),
        "y": scatter(pos[:, 1], 0.0),
        "attr": scatter(attr.astype(jnp.float32), 0.0),
        "occ": scatter(jnp.ones((n,), bool), False),
        "idx": scatter(jnp.arange(n, dtype=jnp.int32), n),
        "overflow": overflow,
    }


def unbind_cells(cells, n: int):
    """Inverse of :func:`bind_cells`: flat (N, 2) positions + (N,) attr in
    the ORIGINAL particle order (via the stored ``idx`` map)."""
    idx = cells["idx"].reshape(-1)
    x = jnp.zeros((n,), jnp.float32).at[idx].set(
        cells["x"].reshape(-1), mode="drop")
    y = jnp.zeros((n,), jnp.float32).at[idx].set(
        cells["y"].reshape(-1), mode="drop")
    attr = jnp.zeros((n,), jnp.float32).at[idx].set(
        cells["attr"].reshape(-1), mode="drop")
    return jnp.stack([x, y], axis=-1), attr


def _roll2(a, dy, dx):
    """Torus roll of an (nc, nc, C) cell array: entry [cy, cx] of the result
    holds cell [cy+dy, cx+dx] (periodic)."""
    return jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))


# ---------------------------------------------------------------------------
# The substep
# ---------------------------------------------------------------------------

def _make_substep(grid: CellGrid, pair_energy, rcut2_of, swap_mode=None,
                  proposal="gaussian"):
    """Build the one-color multi-move MH substep for ONE chain.

    ``pair_energy(r2, a_i, a_j) -> u`` and ``rcut2_of(a_i, a_j) -> rc^2``
    define the model (attributes are the species labels / diameters).

    The substep is built per COLOR (a static (cy0, cx0) parity pair): only
    the active color's ``(nc/2, nc/2, C)`` sub-grid computes proposals and
    energies — the driver dispatches the variants through a ``lax.switch``
    on a substep-shared draw, so each substep pays for the active quarter
    only (not a masked full-grid pass).

    ``swap_mode`` adds a second substep family — WITHIN-CELL attribute
    swaps, the cell-parallel form of swap MC:

    - ``"species"`` (binary LJ): exchange the species of one A and one B
      occupant of each active cell.  The cell's (n_A, n_B) counts are
      invariant under the exchange, so the ``1/(n_A n_B)`` pick
      probabilities cancel exactly.
    - ``"pair"`` (polydisperse): exchange the diameters of an ordered pair
      of distinct occupants; ``1/(n (n-1))`` cancels likewise.

    Swapped particles never move, so simultaneous same-color swaps are
    independent by the same ``w >= rcut + 2 d_cap`` geometry as
    displacements (every affected pair term stays inside the 3x3
    neighbourhoods of the two cells, which are > rcut apart).
    """
    nc, cap, w, d_cap, box = (grid.nc, grid.cap, grid.w, grid.d_cap,
                              grid.box)
    h = nc // 2
    centre = _NEIGH.index((0, 0))

    def _shifted_half(a, axis, parity, d):
        """Cells ``parity + d + 2k`` (periodic) along ``axis``, in active-cell
        order — a strided half-slice plus a +/-1 roll of the HALVED axis when
        the offset wraps (o = parity + d is in {-1, 0, 1, 2} only).  Moves
        ~4x less data than slicing a full-grid torus roll."""
        o = parity + d
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(o % 2, None, 2)
        b = a[tuple(sl)]
        if o == -1:
            b = jnp.roll(b, 1, axis=axis)
        elif o == 2:
            b = jnp.roll(b, -1, axis=axis)
        return b

    def make_stack_nbhd(cy0, cx0):
        def stack_nbhd(cells):
            """One (4, h, h, 9C) packed stacked neighbourhood (x, y, attr,
            occ), built once per substep and shared by all energy passes —
            an order of magnitude fewer op dispatches than a per-offset
            per-field loop (the XLA path is dispatch/bandwidth-bound, not
            flop-bound, at these tile sizes).  Fields pack on the LEADING
            axis so the minor (lane) dimension stays the wide 9C slot axis."""
            if nc <= 24:
                # packed fields + strided half-slices + tiny rolls: fewest
                # dispatches and least data moved; measured fastest on
                # small grids (dispatch-bound regime)
                packed = jnp.stack(
                    [cells["x"], cells["y"], cells["attr"],
                     cells["occ"].astype(jnp.float32)], axis=0)
                blocks = [
                    _shifted_half(_shifted_half(packed, 1, cy0, dy),
                                  2, cx0, dx)
                    for (dy, dx) in _NEIGH]
                nb = jnp.concatenate(blocks, axis=-1)   # (4, h, h, 9C)
                return nb[0], nb[1], nb[2], nb[3] > 0.5
            # large grids (bandwidth-bound): per-field contiguous torus
            # rolls + slice — packing measured ~2x slower at nc = 34
            sl = (slice(cy0, None, 2), slice(cx0, None, 2))
            stack = lambda a: jnp.concatenate(
                [_roll2(a, dy, dx)[sl] for (dy, dx) in _NEIGH], axis=-1)
            return (stack(cells["x"]), stack(cells["y"]),
                    stack(cells["attr"]), stack(cells["occ"]))
        return stack_nbhd

    def excl_centre(occ9, sel):
        """Occupancy with the (h, h, C) one-hot ``sel`` masked out of the
        centre block (the mover's / swappers' own slots)."""
        return occ9 & jnp.logical_not(
            jnp.zeros_like(occ9).at[
                ..., centre * cap:(centre + 1) * cap].set(sel))

    def energy_at(px, py, pa, xs9, ys9, as9, ok9):
        ddx = xs9 - px
        ddy = ys9 - py
        ddx = ddx - box * jnp.round(ddx / box)
        ddy = ddy - box * jnp.round(ddy / box)
        r2 = ddx * ddx + ddy * ddy
        u_p = pair_energy(r2, pa, as9)
        ok = ok9 & (r2 < rcut2_of(pa, as9))
        return jnp.sum(jnp.where(ok, u_p, 0.0), axis=-1)

    def gumbel_pick(key, mask):
        """(h, h, C) one-hot uniform pick among ``mask`` slots (empty mask
        -> all-False one-hot), lowest slot breaking float ties."""
        u = jax.random.uniform(key, mask.shape)
        score = jnp.where(mask, u, -1.0)
        sel = score == jnp.max(score, axis=-1, keepdims=True)
        first = jnp.cumsum(sel.astype(jnp.int32), axis=-1) == 1
        return sel & first & mask

    def make_color(cy0, cx0):
        # static geometry of the active sub-grid
        act_x0 = ((jnp.arange(h, dtype=jnp.float32) * 2 + cx0)
                  * w)[None, :, None]
        act_y0 = ((jnp.arange(h, dtype=jnp.float32) * 2 + cy0)
                  * w)[:, None, None]
        stack9 = make_stack_nbhd(cy0, cx0)

        def color_substep(cells, e_tot, key, sigma, beta):
            kpick, kprop, kacc = jax.random.split(key, 3)
            sl = (slice(cy0, None, 2), slice(cx0, None, 2))
            occ_a = cells["occ"][sl]              # (h, h, C)
            x_a = cells["x"][sl]
            y_a = cells["y"][sl]

            # uniform occupant pick per active cell
            sel = gumbel_pick(kpick, occ_a)
            has = jnp.any(occ_a, axis=-1)

            pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=-1,
                                     keepdims=True)
            xi, yi, ai = pick(x_a), pick(y_a), pick(cells["attr"][sl])

            if proposal == "square":
                # uniform square displacement (hard-disk convention) —
                # symmetric, so the MH ratio is unchanged
                delta = sigma * jax.random.uniform(
                    kprop, (h, h, 2), minval=-1.0, maxval=1.0)
            else:
                delta = sigma * jax.random.normal(kprop, (h, h, 2))
            xn = xi + delta[..., 0:1]
            yn = yi + delta[..., 1:2]
            # anchor constraint: the new position must stay inside the
            # storage cell's +/- d_cap halo (keeps simultaneous moves
            # independent and the 3x3 neighbourhood sufficient for the
            # entire segment)
            inbox = ((xn[..., 0] >= act_x0[..., 0] - d_cap)
                     & (xn[..., 0] < act_x0[..., 0] + w + d_cap)
                     & (yn[..., 0] >= act_y0[..., 0] - d_cap)
                     & (yn[..., 0] < act_y0[..., 0] + w + d_cap))

            xs9, ys9, as9, occ9 = stack9(cells)
            ok9 = excl_centre(occ9, sel)
            d_e = (energy_at(xn, yn, ai, xs9, ys9, as9, ok9)
                   - energy_at(xi, yi, ai, xs9, ys9, as9, ok9))

            u_acc = jax.random.uniform(kacc, (h, h))
            accept = has & inbox & (jnp.log(u_acc) < -beta * d_e)
            upd = sel & accept[..., None]
            cells = {**cells,
                     "x": cells["x"].at[sl].set(jnp.where(upd, xn, x_a)),
                     "y": cells["y"].at[sl].set(jnp.where(upd, yn, y_a))}
            e_tot = e_tot + jnp.sum(jnp.where(accept, d_e, 0.0))
            n_att = jnp.sum(has.astype(jnp.int32))
            n_acc = jnp.sum(accept.astype(jnp.int32))
            return cells, e_tot, n_att, n_acc

        return color_substep

    def make_color_swap(cy0, cx0):
        stack9 = make_stack_nbhd(cy0, cx0)

        def swap_substep(cells, e_tot, key, sigma, beta):
            ki, kj, kacc = jax.random.split(key, 3)
            sl = (slice(cy0, None, 2), slice(cx0, None, 2))
            occ_a = cells["occ"][sl]
            attr_a = cells["attr"][sl]

            if swap_mode == "species":
                is_b = attr_a > 0.5
                sel_i = gumbel_pick(ki, occ_a & jnp.logical_not(is_b))
                sel_j = gumbel_pick(kj, occ_a & is_b)
            else:                       # "pair": ordered distinct pair
                sel_i = gumbel_pick(ki, occ_a)
                sel_j = gumbel_pick(kj, occ_a & jnp.logical_not(sel_i))
            valid = jnp.any(sel_i, axis=-1) & jnp.any(sel_j, axis=-1)

            pick = lambda s, a: jnp.sum(jnp.where(s, a, 0.0), axis=-1,
                                        keepdims=True)
            xi, yi, ai = (pick(sel_i, cells["x"][sl]),
                          pick(sel_i, cells["y"][sl]), pick(sel_i, attr_a))
            xj, yj, aj = (pick(sel_j, cells["x"][sl]),
                          pick(sel_j, cells["y"][sl]), pick(sel_j, attr_a))

            xs9, ys9, as9, occ9 = stack9(cells)
            # exclude BOTH swappers: the i-j pair term is symmetric under
            # the exchange (eps/sig tables and sigma_ij are symmetric) and
            # cancels in dE
            ok9 = excl_centre(occ9, sel_i | sel_j)
            e_old = (energy_at(xi, yi, ai, xs9, ys9, as9, ok9)
                     + energy_at(xj, yj, aj, xs9, ys9, as9, ok9))
            e_new = (energy_at(xi, yi, aj, xs9, ys9, as9, ok9)
                     + energy_at(xj, yj, ai, xs9, ys9, as9, ok9))
            d_e = e_new - e_old

            u_acc = jax.random.uniform(kacc, (h, h))
            accept = valid & (jnp.log(u_acc) < -beta * d_e)
            upd_i = sel_i & accept[..., None]
            upd_j = sel_j & accept[..., None]
            attr_new = jnp.where(upd_i, aj, jnp.where(upd_j, ai, attr_a))
            cells = {**cells,
                     "attr": cells["attr"].at[sl].set(attr_new)}
            e_tot = e_tot + jnp.sum(jnp.where(accept, d_e, 0.0))
            n_att = jnp.sum(valid.astype(jnp.int32))
            n_acc = jnp.sum(accept.astype(jnp.int32))
            return cells, e_tot, n_att, n_acc

        return swap_substep

    parities = tuple((cy0, cx0) for cy0 in (0, 1) for cx0 in (0, 1))
    variants = [make_color(*p) for p in parities]
    if swap_mode is not None:
        variants += [make_color_swap(*p) for p in parities]

    def substep(cells, e_tot, key, variant, sigma, beta):
        """``variant`` = kind * 4 + color (kind 0 = displacement,
        kind 1 = swap when enabled); a substep-shared scalar."""
        return jax.lax.switch(
            variant, [lambda args, f=f: f(*args) for f in variants],
            (cells, e_tot, key, sigma, beta))

    return substep


# ---------------------------------------------------------------------------
# Segment driver
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("grid", "pair_energy", "rcut2_of",
                              "swap_mode", "proposal"))
def cell_mc_segment(grid: CellGrid, pair_energy, rcut2_of, pos, attr, beta,
                    energy, sigma, key, n_substeps, w_disp=1.0,
                    swap_mode=None, box=None, proposal="gaussian"):
    """Run ``n_substeps`` checkerboard substeps on a CHAIN-STACKED state.

    Args:
      grid: static :class:`CellGrid` plan.
      pair_energy / rcut2_of: static model closures on (r2, attr_i, attr_j).
      pos: (M, N, 2); attr: (M, N); beta, energy: (M,).
      sigma: traced proposal width; key: base PRNG key for the segment.
      n_substeps: substep count (traced int; each substep attempts
        ~nc^2/4 moves per chain).
      w_disp: traced probability that a substep is a displacement substep
        (vs a within-cell swap substep) — ignored when ``swap_mode`` is
        None.
      swap_mode: None / "species" / "pair" (see :func:`_make_substep`).

    Returns ``(pos', attr', energy', attempts, accepts, invalid)`` with
    attempts/accepts (M, 2) int32 (column 0 displacement, column 1 swap)
    and invalid (M,) bool — True when the chain's bind was invalid (static
    cell capacity exceeded, or ``box`` no longer matches the static grid).
    Invalid chains pass through UNCHANGED (their segment is a no-op with
    zero counters); the caller must surface the flag as an error.
    """
    m, n, _ = pos.shape
    substep = _make_substep(grid, pair_energy, rcut2_of, swap_mode,
                            proposal)

    cells = jax.vmap(functools.partial(bind_cells, grid))(pos, attr)
    # a chain whose bind is invalid (cell capacity exceeded, or its box no
    # longer matching the static grid — e.g. after a volume move elsewhere
    # in the simulation) must NOT run: its segment becomes a no-op and the
    # latched flag surfaces the failure to the host
    # (Metropolis.validate_state raises at the end of the run)
    invalid = cells.pop("overflow")             # (M,)
    if box is not None:
        invalid = invalid | (jnp.abs(box - grid.box) > 1e-4 * grid.box)
    chain_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, jnp.arange(m, dtype=jnp.uint32))

    def body(i, carry):
        cells, e, att, acc = carry
        # the color/kind draws are SHARED across chains (their own stream
        # off the segment key) so the variant switch stays scalar under
        # vmap — a vectorized switch would execute every branch per substep
        kv = jax.random.fold_in(jax.random.fold_in(key, 0xC0110), i)
        color = jax.random.randint(kv, (), 0, 4)
        if swap_mode is None:
            kind = jnp.zeros((), jnp.int32)
        else:
            kind = (jax.random.uniform(jax.random.fold_in(kv, 1))
                    >= w_disp).astype(jnp.int32)
        variant = kind * 4 + color
        keys_i = jax.vmap(jax.random.fold_in, (0, None))(chain_keys, i)
        cells, e, n_att, n_acc = jax.vmap(
            lambda c, ec, k, b: substep(c, ec, k, variant, sigma, b))(
            cells, e, keys_i, beta)
        koh = jax.nn.one_hot(kind, 2, dtype=jnp.int32)       # (2,)
        att = att + n_att[:, None] * koh[None, :]
        acc = acc + n_acc[:, None] * koh[None, :]
        return cells, e, att, acc

    cells, e, att, acc = jax.lax.fori_loop(
        0, jnp.asarray(n_substeps, jnp.int32), body,
        (cells, energy, jnp.zeros((m, 2), jnp.int32),
         jnp.zeros((m, 2), jnp.int32)))
    pos_out, attr_out = jax.vmap(lambda c: unbind_cells(c, n))(cells)
    pos_out = pos_out % grid.box
    # invalid chains: whole segment is a no-op (their bind dropped
    # particles), counters zeroed so the corruption cannot leak
    pos_out = jnp.where(invalid[:, None, None], pos, pos_out)
    attr_out = jnp.where(invalid[:, None], attr, attr_out)
    e = jnp.where(invalid, energy, e)
    att = jnp.where(invalid[:, None], 0, att)
    acc = jnp.where(invalid[:, None], 0, acc)
    return pos_out, attr_out, e, att, acc, invalid
