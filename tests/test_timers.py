"""TimerManager (reference lib/support/timers.cpp semantics): set/run/stop,
re-arm invalidation, wheel expiry ordering."""

from srsran_project_tpu.support.timers import TimerManager


def test_basic_expiry():
    m = TimerManager()
    fired = []
    t = m.create_timer()
    t.set(3, lambda: fired.append(m.now))
    assert m.tick(2) == 0 and fired == []
    assert t.is_running
    assert m.tick(1) == 1 and fired == [3]
    assert not t.is_running


def test_stop_cancels():
    m = TimerManager()
    fired = []
    t = m.create_timer()
    t.set(2, lambda: fired.append(1))
    t.stop()
    assert m.tick(5) == 0 and fired == []


def test_rearm_replaces_deadline():
    m = TimerManager()
    fired = []
    t = m.create_timer()
    t.set(2, lambda: fired.append(m.now))
    m.tick(1)
    t.set(5)  # re-arm: old deadline (tick 2) must NOT fire
    m.tick(3)
    assert fired == []
    m.tick(2)
    assert fired == [6]


def test_run_rearms_with_same_duration():
    m = TimerManager()
    fired = []
    t = m.create_timer()
    t.set(4, lambda: fired.append(m.now))
    m.tick(4)
    t.run()
    m.tick(4)
    assert fired == [4, 8]


def test_many_timers_and_counters():
    m = TimerManager()
    hits = []
    ts = [m.create_timer() for _ in range(100)]
    for i, t in enumerate(ts):
        t.set(1 + (i % 7), lambda i=i: hits.append(i))
    assert m.nof_running_timers == 100
    m.tick(7)
    assert sorted(hits) == list(range(100))
    assert m.nof_expiries == 100
    assert m.nof_running_timers == 0
