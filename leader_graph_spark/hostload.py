"""Host-load telemetry for bench windows (Linux /proc, stdlib-only).

Why this exists: two rounds running, the driver-run bench carried a
diffuse ~1.1-1.2x wall-time drift across unrelated queries that solo
re-runs on a quiet box could not reproduce — host contention, but the
committed artifact had no evidence either way, so every flagged ratio
needed a post-hoc re-measurement to adjudicate. This module samples
the box around each timed query so the artifact itself says whether a
slow number ran against a busy host:

- ``load1`` before/after (``/proc/loadavg``),
- whole-box busy fraction over the window (``/proc/stat`` cpu-line
  jiffies delta: busy / total),
- OUR fraction (per-pid utime+stime deltas summed over this process
  and its descendants — the Spark JVM and the pyspark daemon workers
  are children of the driver),
- FOREIGN fraction = max(0, busy - ours): CPU consumed by processes
  outside our tree, the contention signal,
- up to five noisiest foreign PIDs with their core-equivalents.

Two /proc sweeps per window, ~1 ms each on a few hundred PIDs —
negligible against multi-second query walls. Processes that exit
mid-window drop out of the per-pid sums (their cycles still show in
``busy``, so they surface in ``foreign`` rather than vanish).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _cpu_jiffies() -> tuple[int, int]:
    """(busy, total) jiffies from the aggregate cpu line; idle+iowait
    count as not-busy. guest/guest_nice (fields 9/10) are already
    folded into user/nice by the kernel, so summing them again would
    double-count VM time — exclude them from total."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    total = sum(vals[:8])
    return total - idle, total


def _pid_sweep() -> dict[int, tuple[int, int, str]]:
    """pid -> (ppid, utime+stime jiffies, comm) for every live PID."""
    out: dict[int, tuple[int, int, str]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                raw = f.read()
        except OSError:
            continue  # raced with process exit
        # comm may contain spaces/parens; fields resume after the last ')'
        rp = raw.rfind(")")
        comm = raw[raw.find("(") + 1 : rp]
        fields = raw[rp + 2 :].split()
        # post-comm indices: 0=state 1=ppid ... 11=utime 12=stime
        out[int(entry)] = (int(fields[1]), int(fields[11]) + int(fields[12]), comm)
    return out


def _tree_pids(sweep: dict[int, tuple[int, int, str]], root: int) -> set[int]:
    children: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in sweep.items():
        children.setdefault(ppid, []).append(pid)
    tree, stack = {root}, [root]
    while stack:
        for c in children.get(stack.pop(), ()):
            if c not in tree:
                tree.add(c)
                stack.append(c)
    return tree


@dataclass
class HostWindow:
    """Context manager: ``with HostWindow() as hw: ...; hw.as_dict()``."""

    noisy_core_threshold: float = 0.25
    max_noisy: int = 5

    def __enter__(self) -> "HostWindow":
        self.load1_before = _loadavg1()
        self._busy0, self._total0 = _cpu_jiffies()
        self._sweep0 = _pid_sweep()
        t = os.times()
        self._reaped0 = t.children_user + t.children_system
        return self

    def __exit__(self, *exc) -> bool:
        self.load1_after = _loadavg1()
        busy1, total1 = _cpu_jiffies()
        sweep1 = _pid_sweep()
        dtotal = max(1, total1 - self._total0)
        self.busy_frac = (busy1 - self._busy0) / dtotal
        me = os.getpid()
        tree = _tree_pids(self._sweep0, me) | _tree_pids(sweep1, me)
        ours = 0
        noisy: list[tuple[float, int, str]] = []
        ncpu = os.cpu_count() or 1
        percpu = dtotal / ncpu
        for pid, (_, jiff1, comm) in sweep1.items():
            prev = self._sweep0.get(pid)
            d = jiff1 - prev[1] if prev else jiff1
            if d <= 0:
                continue
            if pid in tree:
                ours += d
            else:
                cores = d / percpu
                if cores >= self.noisy_core_threshold:
                    noisy.append((cores, pid, comm))
        # Children reaped DURING the window (e.g. short-lived workers)
        # vanish from the end sweep; their cycles land in the parent's
        # os.times() children counters — add that delta so dead tree
        # members attribute to ours, not foreign. The reap counter
        # carries each child's FULL lifetime CPU, so subtract the
        # pre-window portion (its start-sweep jiffies) for tree pids
        # that disappeared in-window; without this, a long-lived child
        # reaped mid-window inflates ours and clamps foreign to 0.
        # Remaining (documented) bias: a grandchild reaped by a
        # still-live intermediate parent reaches our counters only when
        # that parent itself exits, so its cycles show as foreign until
        # then — foreign_frac over-reports, never under-reports, which
        # is the safe direction for a contention signal.
        t = os.times()
        hz = os.sysconf("SC_CLK_TCK")
        pre_window_dead = sum(
            self._sweep0[pid][1]
            for pid in tree
            if pid in self._sweep0 and pid not in sweep1
        )
        reaped_delta = int((t.children_user + t.children_system - self._reaped0) * hz)
        ours += max(0, reaped_delta - pre_window_dead)
        self.ours_frac = ours / dtotal
        self.foreign_frac = max(0.0, self.busy_frac - self.ours_frac)
        noisy.sort(reverse=True)
        self.noisy = [
            {"pid": p, "comm": c, "cores": round(k, 2)}
            for k, p, c in noisy[: self.max_noisy]
        ]
        return False

    def as_dict(self) -> dict:
        return {
            "load1_before": round(self.load1_before, 2),
            "load1_after": round(self.load1_after, 2),
            "busy_frac": round(self.busy_frac, 3),
            "ours_frac": round(self.ours_frac, 3),
            "foreign_frac": round(self.foreign_frac, 3),
            "noisy_foreign": self.noisy,
        }
