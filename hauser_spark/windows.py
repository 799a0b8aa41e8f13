"""Bundle window math — the reference's tumbling-window assignment and
maturity (watermark) gate, as pure driver-side functions.

Reference: next bundle = ``[lastSync, truncate(lastSync + dur, dur))``
(internal/service.go:280-284); processed only once ``now - ExportDelay``
passes the window end (internal/service.go:286-294); duration must divide
24h so windows align to day boundaries (config/config.go:183-187).

These are intentionally driver-side: hauser's stream-of-bundles is a
poll-and-sleep batch loop, and Spark's own tumbling ``window()`` function
covers the in-data windowing cases (see plans/events.py W1 query).
"""

from __future__ import annotations

import datetime as dt

EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def truncate(t: dt.datetime, duration: dt.timedelta) -> dt.datetime:
    """Go time.Truncate: round down to a multiple of duration since epoch."""
    secs = (t - EPOCH).total_seconds()
    dur = duration.total_seconds()
    return EPOCH + dt.timedelta(seconds=(int(secs // dur) * dur))


def next_bundle_window(
    last_sync: dt.datetime, duration: dt.timedelta
) -> tuple[dt.datetime, dt.datetime]:
    """[start, end) of the next bundle (internal/service.go:281-284).

    End is epoch-aligned: truncate(start + dur, dur) — so a partial first
    window snaps to the alignment grid, matching Spark's epoch-aligned
    ``window()`` semantics.
    """
    start = last_sync
    end = truncate(start + duration, duration)
    return start, end


def wait_duration(
    window_end: dt.datetime, now: dt.datetime, export_delay: dt.timedelta
) -> dt.timedelta:
    """How long until the window is mature (internal/service.go:286-294).

    <= 0 ⇒ process now (catch-up); > 0 ⇒ sleep this long.
    """
    return window_end - (now - export_delay)


def validate_export_duration(duration: dt.timedelta) -> None:
    """config/config.go:20-21,183-187: 15m ≤ dur ≤ 24h, divides 24h evenly."""
    day = dt.timedelta(hours=24)
    if duration < dt.timedelta(minutes=15):
        raise ValueError("ExportDuration must be at least 15 minutes")
    if duration > day:
        raise ValueError("ExportDuration must be at most 24 hours")
    if (day.total_seconds() % duration.total_seconds()) != 0:
        raise ValueError("ExportDuration must evenly divide 24 hours")


def validate_export_delay(delay: dt.timedelta) -> None:
    """config/config.go:189-193: at least 1 hour."""
    if delay < dt.timedelta(hours=1):
        raise ValueError("ExportDelay must be at least 1 hour")
