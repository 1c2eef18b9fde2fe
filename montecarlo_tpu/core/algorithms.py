"""Algorithm lifecycle protocol + recorder algorithms.

Reimagines the reference's "everything on a timestep is an algorithm" design
(``src/algorithms.jl``) for a jit-compiled engine.  The reference has one kind
of algorithm (mutate-the-simulation in ``make_step!``); here algorithms are
split by where they run so the orchestrator can fuse device work into compiled
segments (SURVEY §7.4):

- :class:`DeviceAlgorithm` — a pure, traceable state transform executed inside
  the compiled time loop (Metropolis sweeps, PGMC estimator/update).
- :class:`ObservableRecorder` — declares a traceable observable of device
  state; the orchestrator evaluates it on device (possibly batched into
  on-device ring buffers) and hands host-side numpy values to ``write``.
  Covers StoreCallbacks / StoreTrajectories / StoreParameters / StoreBackups
  (``src/algorithms.jl:62-303``, ``src/metropolis.jl:380-450``).
- :class:`HostAlgorithm` — arbitrary host code at scheduled steps
  (PrintTimeSteps, ``src/algorithms.jl:310-323``).

All keep the reference's 3-hook lifecycle ``initialise`` / step / ``finalise``
(``src/algorithms.jl:6-37``) and its on-disk layout so downstream tooling is
drop-in compatible.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Any, Callable, Sequence

import jax
import numpy as np

def _io_host() -> bool:
    """Recorder files are written once per run: by process 0 (multi-host
    runs compute observables globally on every process, but only the IO host
    touches the filesystem)."""
    return jax.process_index() == 0


__all__ = [
    "Algorithm",
    "DeviceAlgorithm",
    "ObservableRecorder",
    "HostAlgorithm",
    "SimView",
    "Format",
    "TXT",
    "DAT",
    "BIN",
    "StoreCallbacks",
    "StoreTrajectories",
    "load_chain_major_trajectories",
    "StoreLastFrames",
    "StoreBackups",
    "PrintTimeSteps",
]


@dataclasses.dataclass(frozen=True)
class SimView:
    """Traceable view of device state handed to callbacks and observables.

    Replaces the reference's convention of callbacks receiving the whole
    mutable ``Simulation`` (``src/algorithms.jl:97``): here callbacks are pure
    functions of the device-state pytree, so they can run inside jit and be
    buffered on device.
    """

    sys: Any          # chain-stacked system state (leading chain axis)
    params: Any       # tuple of move-parameter pytrees (replicated)
    t: Any            # current step (traced i32 scalar)
    state: Any        # full device-state dict (algorithm slices by state_key)


class Algorithm:
    """Base lifecycle (ref ``AriannaAlgorithm``, ``src/algorithms.jl:6-37``)."""

    def initialise(self, sim) -> None:
        return None

    def finalise(self, sim) -> None:
        return None

    def write_summary(self, io, scheduler) -> None:
        io.write(f"\t{type(self).__name__}\n")
        io.write(f"\t\tCalls: {_n_calls(scheduler)}\n")


def _n_calls(scheduler) -> int:
    s = np.asarray(scheduler)
    if s.size == 0:
        return 0
    return int(np.count_nonzero((s > 0) & (s <= s[-1])))


class DeviceAlgorithm(Algorithm):
    """A pure state transform scheduled inside the compiled time loop."""

    #: unique key for this algorithm's slice of the device-state dict
    state_key: str = ""

    def init_state(self, sim) -> Any:
        """Return this algorithm's initial device-state slice (pytree)."""
        return ()

    def step(self, dstate: dict, t) -> dict:
        """Pure traceable update of the device-state dict at step ``t``."""
        raise NotImplementedError


class ObservableRecorder(Algorithm):
    """Records a traceable observable of device state at scheduled steps."""

    store_first: bool = True
    store_last: bool = False

    def observable(self, view: SimView):
        """Pure traceable function of the device state (pytree-valued)."""
        raise NotImplementedError

    def write(self, sim, t: int, value) -> None:
        """Host-side write of one observation (``value`` is numpy)."""
        raise NotImplementedError

    def write_batch(self, sim, ts, value) -> None:
        """Write a whole buffered chunk (leaves of ``value`` have a leading
        time axis aligned with ``ts``).  Default: per-event loop; recorders
        with dense schedules override this with vectorized formatting."""
        for j, t in enumerate(ts):
            self.write(sim, t, jax.tree_util.tree_map(
                lambda x: x[j], value))


class HostAlgorithm(Algorithm):
    """Arbitrary host-side work at scheduled steps."""

    def make_step(self, sim, t: int) -> None:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Output formats (ref ``Format``/``TXT``/``DAT``, ``src/algorithms.jl:116-140``)
# ---------------------------------------------------------------------------

class Format:
    extension = ""


class TXT(Format):
    extension = ".txt"


class DAT(Format):
    extension = ".dat"


class BIN(Format):
    """Chain-major consolidated binary trajectory layout.

    The reference's one-text-file-per-chain layout
    (``src/algorithms.jl:154-210``) is faithful at M ~ 10^2 but impossible
    at the engine's flagship chain counts (10^4—10^6 chains: fd limits,
    10^8+ formatted writes).  ``StoreTrajectories(fmt=BIN())`` instead
    appends each buffered chunk as raw C-order records to ONE file per
    frame field — ``trajectories/<field>.bin`` with a leading (time, chain)
    axis pair — plus ``trajectories/index.json`` (dtype/shape/times
    manifest) at finalise.  Read back with
    :func:`load_chain_major_trajectories` (zero-copy ``np.memmap``)."""

    extension = ".bin"


def _fmt_scalar(v) -> str:
    """Format a scalar the way Julia prints floats (shortest round-trip)."""
    v = np.asarray(v)
    if v.dtype.kind in "iub":
        return str(int(v))
    return repr(float(v))


# ---------------------------------------------------------------------------
# StoreCallbacks (ref ``src/algorithms.jl:62-109``)
# ---------------------------------------------------------------------------

class StoreCallbacks(ObservableRecorder):
    """Append ``"t value"`` lines, one ``.dat`` file per callback.

    Matches the reference's filename convention: the ``callback_`` prefix of
    the function name is stripped (``src/algorithms.jl:71``), so
    ``callback_energy`` writes ``energy.dat``.
    """

    def __init__(self, sim, callbacks: Sequence[Callable] = (),
                 store_first: bool = True, store_last: bool = False,
                 dependencies=(), **_):
        self.callbacks = tuple(callbacks)
        self.store_first = store_first
        self.store_last = store_last
        names = [getattr(cb, "__name__", f"callback{i}").replace("callback_", "")
                 for i, cb in enumerate(self.callbacks)]
        self.paths = [os.path.join(sim.path, f"{n}.dat") for n in names]
        self.files = []

    def initialise(self, sim):
        if not _io_host():
            return
        if sim.verbose:
            print("Opening callback files...")
        os.makedirs(sim.path, exist_ok=True)
        self.files = [open(p, "w") for p in self.paths]

    def observable(self, view: SimView):
        return tuple(cb(view) for cb in self.callbacks)

    def write(self, sim, t, value):
        if not _io_host():
            return
        for f, v in zip(self.files, value):
            f.write(f"{t} {_fmt_scalar(v)}\n")
            f.flush()

    def write_batch(self, sim, ts, value):
        if not _io_host():
            return
        for f, col in zip(self.files, value):
            col = np.asarray(col)
            f.write("".join(f"{t} {v!r}\n"
                            for t, v in zip(ts, col.tolist())))
            f.flush()

    def finalise(self, sim):
        if sim.verbose:
            print("Closing callback files...")
        for f in self.files:
            f.close()
        self.files = []


# ---------------------------------------------------------------------------
# StoreTrajectories (ref ``src/algorithms.jl:154-210``)
# ---------------------------------------------------------------------------

class StoreTrajectories(ObservableRecorder):
    """One ``trajectories/<c>/trajectory.dat`` per chain (1-based dirs).

    The per-chain line format comes from the system's ``format_frame`` hook,
    the analogue of overriding ``store_trajectory``
    (``example/particle_1d/particle_1d.jl:63-66``).

    ``fmt=BIN()`` switches to the chain-major consolidated layout (see
    :class:`BIN`) — the scalable store for 10^4+ chains, where a file per
    chain is impossible.
    """

    def __init__(self, sim, fmt: Format = DAT(), store_first: bool = True,
                 store_last: bool = False, dependencies=(), **_):
        self.fmt = fmt
        self.store_first = store_first
        self.store_last = store_last
        self.system = sim.system
        self.chain_major = isinstance(fmt, BIN)
        self.n_chains = sim.n_chains
        if self.chain_major:
            self.dir = os.path.join(sim.path, "trajectories")
            self._times = []
            self._field_files = {}
            self._field_spec = {}
            return
        self.dirs = [os.path.join(sim.path, "trajectories", str(c + 1))
                     for c in range(sim.n_chains)]
        self.paths = [os.path.join(d, "trajectory" + fmt.extension)
                      for d in self.dirs]
        self.files = []

    def initialise(self, sim):
        if not _io_host():
            return
        if sim.verbose:
            print("Opening trajectory files...")
        if self.chain_major:
            os.makedirs(self.dir, exist_ok=True)
            self._times = []
            self._field_files = {}
            self._field_spec = {}
            return
        for d in self.dirs:
            os.makedirs(d, exist_ok=True)
        self.files = [open(p, "w") for p in self.paths]

    def observable(self, view: SimView):
        return jax.vmap(self.system.frame)(view.sys)

    # -- chain-major binary layout ------------------------------------------
    def _append_records(self, ts, value):
        """Append a (T, M, ...) pytree chunk to the per-field bin files."""
        for path, leaf in jax.tree_util.tree_leaves_with_path(value):
            name = _field_name(path)
            leaf = np.ascontiguousarray(leaf)
            if name not in self._field_files:
                self._field_files[name] = open(
                    os.path.join(self.dir, name + ".bin"), "wb")
                self._field_spec[name] = {
                    "dtype": leaf.dtype.str,
                    "shape": list(leaf.shape[1:]),   # (M, ...) per record
                }
            leaf.tofile(self._field_files[name])
        self._times.extend(int(t) for t in ts)

    def write(self, sim, t, value):
        # No per-event flush (the reference flushes every line,
        # src/algorithms.jl:204); buffered IO + flush at finalise keeps the
        # same file contents without 10^6 syscalls on dense schedules.
        if not _io_host():
            return
        if self.chain_major:
            self._append_records(
                [t], jax.tree_util.tree_map(lambda x: np.asarray(x)[None],
                                            value))
            return
        fmt = self.system.format_frame
        rows = _unstack(value)
        t = int(t)
        for f, row in zip(self.files, rows):
            f.write(fmt(t, row) + "\n")

    def write_batch(self, sim, ts, value):
        if not _io_host():
            return
        if self.chain_major:
            self._append_records(ts, value)
            return
        fmt = self.system.format_frame
        if isinstance(value, np.ndarray) and value.ndim == 2:
            # scalar frames: one string join per chain instead of one
            # f.write per (time, chain) pair
            for c, f in enumerate(self.files):
                col = value[:, c].tolist()
                f.write("".join(
                    fmt(t, v) + "\n" for t, v in zip(ts, col)))
        else:
            super().write_batch(sim, ts, value)

    def finalise(self, sim):
        if sim.verbose:
            print("Closing trajectory files...")
        if self.chain_major:
            import json
            for f in self._field_files.values():
                f.close()
            if _io_host():
                # write the manifest even for an empty run so the loader
                # never hits a missing index.json
                os.makedirs(self.dir, exist_ok=True)
                with open(os.path.join(self.dir, "index.json"), "w") as f:
                    json.dump({"n_chains": self.n_chains,
                               "times": self._times,
                               "fields": self._field_spec}, f)
            self._field_files = {}
            return
        for f in self.files:
            f.close()
        self.files = []


def _field_name(path) -> str:
    """Stable field name from a pytree key path ('' -> 'frame')."""
    s = jax.tree_util.keystr(path)
    s = s.replace("['", "_").replace("']", "").replace(".", "_")
    s = s.replace("[", "_").replace("]", "").strip("_")
    return s or "frame"


def load_chain_major_trajectories(path):
    """Load a chain-major trajectory store written by
    ``StoreTrajectories(fmt=BIN())``.

    ``path`` is the run directory (or its ``trajectories/`` subdir).
    Returns ``(times, fields)`` — times an int64 array (T,), fields a dict
    of zero-copy ``np.memmap`` arrays shaped (T, M, ...), so 10^6-chain
    stores open without loading into RAM."""
    import json
    d = path if os.path.basename(os.path.normpath(path)) == "trajectories" \
        else os.path.join(path, "trajectories")
    with open(os.path.join(d, "index.json")) as f:
        idx = json.load(f)
    times = np.asarray(idx["times"], np.int64)
    fields = {}
    for name, spec in idx["fields"].items():
        shape = (len(times),) + tuple(spec["shape"])
        if len(times) == 0:
            fields[name] = np.empty(shape, np.dtype(spec["dtype"]))
            continue
        fields[name] = np.memmap(os.path.join(d, name + ".bin"),
                                 dtype=np.dtype(spec["dtype"]), mode="r",
                                 shape=shape)
    return times, fields


def _unstack(value):
    """Split a chain-stacked numpy pytree into per-chain rows."""
    leaves, treedef = jax.tree_util.tree_flatten(value)
    n = leaves[0].shape[0]
    return [jax.tree_util.tree_unflatten(treedef, [lf[c] for lf in leaves])
            for c in range(n)]


# ---------------------------------------------------------------------------
# StoreLastFrames (ref ``src/algorithms.jl:221-251``)
# ---------------------------------------------------------------------------

class StoreLastFrames(Algorithm):
    """At finalise only, write ``trajectories/<c>/lastframe.dat`` per chain."""

    def __init__(self, sim, fmt: Format = DAT(), dependencies=(), **_):
        self.fmt = fmt
        self.system = sim.system
        self.dirs = [os.path.join(sim.path, "trajectories", str(c + 1))
                     for c in range(sim.n_chains)]

    def finalise(self, sim):
        from ..parallel.mesh import fetch
        frames = fetch(jax.vmap(self.system.frame)(sim.device_state["sys"]))
        if not _io_host():
            return
        t = int(sim.t)
        for d, row in zip(self.dirs, _unstack(frames)):
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "lastframe" + self.fmt.extension), "w") as f:
                f.write(self.system.format_frame(t, row) + "\n")


# ---------------------------------------------------------------------------
# StoreBackups (ref ``src/algorithms.jl:264-303``) — upgraded with a loader
# ---------------------------------------------------------------------------

class StoreBackups(ObservableRecorder):
    """Scheduled restart snapshots, plus a *restorable* binary checkpoint.

    The reference writes per-chain ``restart_t<t>.dat`` text files with no
    loader (SURVEY §5).  We keep that text layout for parity and additionally
    write ``checkpoints/ckpt_t<t>.npz`` containing the full device-state
    pytree (chains + RNG keys + counters + move parameters + step), which
    ``montecarlo_tpu.checkpoint.restore`` can reload to resume a run.
    """

    #: never fold backup events into buffered scan chunks — `write` snapshots
    #: sim.device_state for the .npz checkpoint, which must be the state at
    #: the event time, not at the end of a chunk
    buffered_ok = False

    def __init__(self, sim, fmt: Format = DAT(), store_first: bool = False,
                 store_last: bool = False, checkpoint: bool = True,
                 dependencies=(), **_):
        self.fmt = fmt
        self.store_first = store_first
        self.store_last = store_last
        self.checkpoint = checkpoint
        self.system = sim.system
        self.dirs = [os.path.join(sim.path, "trajectories", str(c + 1))
                     for c in range(sim.n_chains)]
        self.ckpt_dir = os.path.join(sim.path, "checkpoints")
        self._sim = sim

    def initialise(self, sim):
        for d in self.dirs:
            os.makedirs(d, exist_ok=True)
        if self.checkpoint:
            os.makedirs(self.ckpt_dir, exist_ok=True)

    def observable(self, view: SimView):
        return jax.vmap(self.system.frame)(view.sys)

    def write(self, sim, t, value):
        t = int(t)
        if self.checkpoint:
            # checkpoint serialisation all-gathers sharded leaves — a
            # collective, so every process participates; only the IO host
            # actually touches the filesystem inside save()
            from .. import checkpoint as ckpt
            ckpt.save(os.path.join(self.ckpt_dir, f"ckpt_t{t}.npz"),
                      sim.device_state)
        if not _io_host():
            return
        for d, row in zip(self.dirs, _unstack(value)):
            path = os.path.join(d, f"restart_t{t}{self.fmt.extension}")
            with open(path, "w") as f:
                f.write(self.system.format_frame(t, row) + "\n")


# ---------------------------------------------------------------------------
# PrintTimeSteps (ref ``src/algorithms.jl:310-323``)
# ---------------------------------------------------------------------------

class PrintTimeSteps(HostAlgorithm):
    """ANSI progress bar."""

    def __init__(self, sim, dependencies=(), **_):
        pass

    def make_step(self, sim, t):
        percent = t / sim.steps
        bar_length = 50
        filled = int(round(percent * bar_length))
        bar = ("\033[1;34m" + "■" * filled + "\033[0m"
               + "□" * (bar_length - filled))
        sys.stdout.write(f"\rProgress: [{bar}] {percent * 100:.0f}% t = {t}")
        sys.stdout.flush()
