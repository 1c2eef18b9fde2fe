"""build_schedule parity with the reference overloads
(``src/simulation.jl:95,104,113``) + compress_runs invariants."""

import numpy as np

from montecarlo_tpu.core.schedule import build_schedule, compress_runs


def test_linear_schedule():
    s = build_schedule(100, 10, 20)
    assert list(s) == [10, 30, 50, 70, 90, 100]
    # endpoint always included (ref: ∪ [steps])
    s = build_schedule(100, 0, 25)
    assert list(s) == [0, 25, 50, 75, 100]


def test_log_schedule():
    s = build_schedule(1000, 10, 2.0)
    # burn, burn + 2^n up to steps-burn, steps
    expected = np.unique([10] + [10 + 2 ** n for n in range(10)] + [1000])
    assert list(s) == list(expected)


def test_block_schedule():
    s = build_schedule(100, 0, [0, 10])
    assert list(s) == list(range(0, 101, 10))
    s = build_schedule(50, 10, [0, 3, 10])
    # blocks of [0,3] at stride 10 starting at burn, capped at steps
    expected = sorted(set(
        [10 + m * 10 + b for m in range(4) for b in (0, 3)] + [50]))
    assert list(s) == expected


def test_schedules_sorted_unique():
    for spec in (7, 2.5, [0, 2, 5]):
        s = build_schedule(977, 13, spec)
        assert np.all(np.diff(s) > 0)
        assert s[-1] == 977


def test_compress_runs_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        times = np.unique(rng.integers(0, 500, size=rng.integers(1, 60)))
        runs = compress_runs(times)
        rebuilt = np.concatenate(
            [start + stride * np.arange(count)
             for start, stride, count in runs]).astype(np.int64)
        assert list(rebuilt) == list(times)


def test_compress_runs_uniform():
    times = np.arange(100, 10001, 10)
    runs = compress_runs(times)
    assert len(runs) == 1
    assert runs[0] == (100, 10, len(times))
