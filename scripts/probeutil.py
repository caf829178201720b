"""Shared helpers for the soak/scale-probe scripts (round-11 review:
the /proc/self/status RSS parser had been copy-pasted into seven
scripts — a fix there had to land seven times or the probes would
silently diverge)."""

from __future__ import annotations


def rss_kb() -> int:
    """Driver-process resident set size in KiB (0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
    except (OSError, ValueError, IndexError):
        pass
    return 0


def rss_mb() -> float:
    return rss_kb() / 1024.0
