"""Host-quiescence gate sanity (docinsight_spark/hostload.py)."""

import docinsight_spark.hostload as hl


def test_loadavg_nonnegative():
    assert hl.loadavg() >= 0.0


def test_steal_fraction_bounded():
    s = hl.steal_fraction(interval=0.2)
    assert 0.0 <= s <= 1.0


def test_wait_quiet_records_outcome(monkeypatch):
    # force the "already quiet" fast path: no waiting, quiet=True
    monkeypatch.setattr(hl, "loadavg", lambda: 0.5)
    monkeypatch.setattr(hl, "steal_fraction", lambda interval=3.0: 0.001)
    got = hl.wait_quiet(load_max=3.0, steal_max=0.02, wait_sec=1.0)
    assert got["quiet"] is True and got["waited_sec"] < 1.0


def test_wait_quiet_gives_up_and_reports(monkeypatch):
    # a permanently-busy host: the gate must return (not hang) and say so
    monkeypatch.setattr(hl, "loadavg", lambda: 50.0)
    monkeypatch.setattr(hl, "steal_fraction", lambda interval=3.0: 0.5)
    monkeypatch.setattr(hl.time, "sleep", lambda s: None)
    got = hl.wait_quiet(load_max=3.0, steal_max=0.02, wait_sec=0.0)
    assert got["quiet"] is False
