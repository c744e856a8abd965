"""HostWindow telemetry: the bench artifact's contention evidence
must attribute a busy window to OUR process tree vs foreign PIDs."""

from __future__ import annotations

import multiprocessing
import os
import time

from leader_graph_spark.hostload import HostWindow, _pid_sweep, _tree_pids


def _spin(sec: float) -> None:
    end = time.perf_counter() + sec
    while time.perf_counter() < end:
        pass


def test_window_attributes_own_child_to_ours():
    ctx = multiprocessing.get_context("fork")
    with HostWindow() as hw:
        p = ctx.Process(target=_spin, args=(0.6,))
        p.start()
        p.join()
    d = hw.as_dict()
    # one core spinning 0.6s inside the window: ours_frac must register
    # (>= ~0.5 core-equivalents out of ncpu cores busy for the window)
    assert d["ours_frac"] > 0.2 / (os.cpu_count() or 1)
    assert 0.0 <= d["foreign_frac"] <= 1.0
    assert d["load1_before"] >= 0.0 and d["load1_after"] >= 0.0
    # our spinning child must never appear in the foreign noisy list
    assert all(n["pid"] != p.pid for n in d["noisy_foreign"])


def test_tree_pids_contains_self_and_children():
    sweep = _pid_sweep()
    me = os.getpid()
    tree = _tree_pids(sweep, me)
    assert me in tree
    assert 1 not in tree or me == 1  # init is not our descendant


def test_idle_window_near_zero_ours():
    with HostWindow() as hw:
        time.sleep(0.3)
    d = hw.as_dict()
    # sleeping python burns ~nothing; busy_frac reflects whatever the
    # box does, but OUR fraction must be near zero
    assert d["ours_frac"] < 0.1
