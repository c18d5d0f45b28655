"""Pin bench.py's canonical slope-timing protocol (BASELINE.md recipe).

The relay charges a drifting fixed cost per execution and memoizes
byte-identical calls (CLAUDE.md), so every BENCH_r{N} number flows through
``bench._marginal_step_time``. These tests pin its contract on the host —
no device, pure timing algebra — so a regression in the estimator cannot
silently skew a round's scoreboard:

* three interleaved chain lengths (n, 2n, 3n), each warmed before timing;
* min PER LENGTH (least-congested sample), then the MEDIAN of the three
  pairwise slopes — robust where min-of-slopes is optimistically biased
  and a single (n,3n) pair inherits drift (BENCH_r01–r04 under-read the
  pinned train rows 10–30 % that way);
* rep-distinct ``k`` per timed call so the relay cannot memoize;
* non-positive slope falls back to total/length of the longest chain.
"""

import pytest

import bench

pytestmark = pytest.mark.smoke


def _run_with_fake_clock(times_for):
    """Drive _marginal_step_time with a deterministic fake _timed."""
    calls = []

    def run(k, n):
        calls.append((k, n))

    orig = bench._timed

    def fake_timed(fn):
        fn()
        k, n = calls[-1]
        return times_for(k, n)

    bench._timed = fake_timed
    try:
        per = bench._marginal_step_time(run, 20)
    finally:
        bench._timed = orig
    return per, calls


def test_slope_cancels_fixed_overhead_and_spikes():
    # 1s fixed relay cost + 10ms/step, with one congested sample per
    # length (k % 4 == 1 adds 0.5s): min-per-length must drop the spike
    # and the median pairwise slope must read exactly 10ms.
    per, calls = _run_with_fake_clock(
        lambda k, n: 1.0 + 0.010 * n + (0.5 if k % 4 == 1 else 0.0)
    )
    assert per == pytest.approx(0.010, abs=1e-12)
    # warmups first (one per length, out-of-range reps), then 3 rounds
    # interleaving all three lengths.
    assert calls[:3] == [(10_000, 20), (10_001, 40), (10_002, 60)]
    assert len(calls) == 3 + 9
    timed = calls[3:]
    assert [n for _, n in timed] == [20, 40, 60] * 3  # interleaved
    ks = [k for k, _ in timed]
    assert len(set(ks)) == len(ks)  # rep-distinct: relay cannot memoize


def test_median_rejects_one_corrupted_length():
    # If ONE length's best sample is still inflated (persistent congestion
    # on that executable), two of the three pairwise slopes are wrong but
    # the median still has one clean pair to agree with.
    def times(k, n):
        extra = 0.4 if n == 40 else 0.0  # every 2n sample congested
        return 1.0 + 0.010 * n + extra

    per, _ = _run_with_fake_clock(times)
    # pairwise slopes: n->2n = 30ms, 2n->3n = -10ms, n->3n = 10ms (clean);
    # median picks the clean 10ms.
    assert per == pytest.approx(0.010, abs=1e-12)


def test_nonpositive_slope_falls_back_to_longest_chain():
    # Pathological drift: totals DECREASE with length. Median slope goes
    # negative; the estimator must fall back to total/length of the
    # longest chain rather than report a nonsense step time.
    per, _ = _run_with_fake_clock(lambda k, n: 3.0 - 0.01 * n)
    assert per == pytest.approx((3.0 - 0.01 * 60) / 60, abs=1e-12)
