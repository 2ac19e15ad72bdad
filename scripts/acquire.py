"""Dump-acquisition lifecycle (driver-side, NOT an engine operator).

The reference runs a nightly acquisition script (reference
download.py:42-100): log in, read the currently-published dump
timestamp, SKIP if that timestamp was already downloaded
(download.py:72-74 — the dedup-by-timestamp predicate), otherwise
stream the archive to disk in chunks and append the timestamp to a
history file. Credentials come from a secrets service
(download.py:17-26).

This module restates that lifecycle as testable pure logic with
injected I/O, because the engine environment has no network and no
secrets service (declared non-goals, SURVEY.md §7.6):

* the timestamp-dedup predicate and history file round-trip are real
  and unit-tested (the part that prevents re-ingesting last night's
  dump into the staging pipeline);
* the discovery/fetch steps are CALLABLES the operator of a real
  deployment supplies (an HTTP client, a mirror copy, a manual drop);
  the default fetchers fail fast with a clear message instead of
  pretending to reach the network;
* credentials resolve from the environment or the YAML config
  (gcd_etl_spark/config.py), never from a hardcoded cloud client.

Once acquired, the archive feeds the engine through the distributed
dump tokenizer (gcd_etl_spark/sources/dump.py) — acquisition ends
where the Spark surface begins.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable
from dataclasses import dataclass

DEFAULT_HISTORY_FILE = "download_history.txt"
#: Chunked streaming write size — same order as the reference's
#: 5000 KiB chunks (download.py:95).
CHUNK_BYTES = 5000 * 1024


def load_history(path: str) -> list[str]:
    """Previously-acquired dump timestamps, newline-delimited,
    order-preserving (reference download.py:38-40)."""
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as fh:
        return [line.strip() for line in fh if line.strip()]


def already_acquired(timestamp: str, history: Iterable[str]) -> bool:
    """The dedup predicate (reference download.py:72-74): a dump is
    identified solely by its published timestamp string."""
    return timestamp.strip() in {h.strip() for h in history}


def record_acquired(timestamp: str, path: str) -> None:
    """Append-only history update, written ONLY after a successful
    download (reference download.py:99-100) so a failed transfer is
    retried next run."""
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(f"{timestamp}\n")


def dump_filename(timestamp: str) -> str:
    """Archive name derived from the timestamp (reference
    download.py:77 replaces only spaces; we also sanitize ':' —
    invalid on Windows filesystems and awkward for archival tooling —
    to '-', so '2024-01-15 03:00:00' -> 'gcd-dump-2024-01-15_03-00-00.zip'
    (ADVICE round 6). Dedup identity stays the raw timestamp string,
    not the filename)."""
    return f"gcd-dump-{timestamp.replace(' ', '_').replace(':', '-')}.zip"


def _no_network(*_args, **_kwargs):
    raise NotImplementedError(
        "no network in this environment: supply discover_timestamp= and "
        "fetch= callables (an HTTP client against the upstream download "
        "page, or a mirror/manual drop) to run acquisition for real"
    )


@dataclass(frozen=True)
class AcquireResult:
    timestamp: str
    skipped: bool
    filename: str | None


def acquire_once(
    history_file: str = DEFAULT_HISTORY_FILE,
    discover_timestamp: Callable[[], str] = _no_network,
    fetch: Callable[[str, str], None] = _no_network,
) -> AcquireResult:
    """One nightly acquisition cycle.

    1. discover the currently-published dump timestamp;
    2. skip (no fetch, no history write) if it is already in history;
    3. otherwise fetch to the timestamp-derived filename and append
       the timestamp to history.

    ``fetch(timestamp, filename)`` owns transfer details (chunked
    streaming at ~CHUNK_BYTES, auth, license acceptance).
    """
    timestamp = discover_timestamp().strip()
    if already_acquired(timestamp, load_history(history_file)):
        return AcquireResult(timestamp=timestamp, skipped=True, filename=None)
    filename = dump_filename(timestamp)
    fetch(timestamp, filename)
    record_acquired(timestamp, history_file)
    return AcquireResult(timestamp=timestamp, skipped=False, filename=filename)


if __name__ == "__main__":  # pragma: no cover - needs injected I/O
    acquire_once()
