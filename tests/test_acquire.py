"""Acquisition-lifecycle logic (scripts/acquire.py) — the
dedup-by-timestamp predicate and history round-trip, no network."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from acquire import (  # noqa: E402
    AcquireResult,
    acquire_once,
    already_acquired,
    dump_filename,
    load_history,
    record_acquired,
)


def test_fresh_timestamp_fetches_and_records(tmp_path):
    hist = str(tmp_path / "history.txt")
    fetched = []
    res = acquire_once(
        history_file=hist,
        discover_timestamp=lambda: "2024-01-15 03:00:00",
        fetch=lambda ts, fn: fetched.append((ts, fn)),
    )
    assert res == AcquireResult(
        timestamp="2024-01-15 03:00:00",
        skipped=False,
        filename="gcd-dump-2024-01-15_03-00-00.zip",
    )
    assert fetched == [("2024-01-15 03:00:00", "gcd-dump-2024-01-15_03-00-00.zip")]
    assert load_history(hist) == ["2024-01-15 03:00:00"]


def test_second_run_same_timestamp_skips_without_fetch(tmp_path):
    hist = str(tmp_path / "history.txt")
    record_acquired("2024-01-15 03:00:00", hist)

    def boom(*a):
        raise AssertionError("fetch must not run for a known timestamp")

    res = acquire_once(
        history_file=hist,
        discover_timestamp=lambda: "2024-01-15 03:00:00",
        fetch=boom,
    )
    assert res.skipped is True and res.filename is None
    # history unchanged — no duplicate append
    assert load_history(hist) == ["2024-01-15 03:00:00"]


def test_new_timestamp_after_history_fetches_again(tmp_path):
    hist = str(tmp_path / "history.txt")
    for ts in ("2024-01-14 03:00:00", "2024-01-15 03:00:00"):
        record_acquired(ts, hist)
    res = acquire_once(
        history_file=hist,
        discover_timestamp=lambda: "2024-01-16 03:00:00",
        fetch=lambda ts, fn: None,
    )
    assert res.skipped is False
    assert load_history(hist)[-1] == "2024-01-16 03:00:00"


def test_failed_fetch_leaves_history_unwritten(tmp_path):
    hist = str(tmp_path / "history.txt")

    def failing(ts, fn):
        raise OSError("connection reset")

    with pytest.raises(OSError):
        acquire_once(
            history_file=hist,
            discover_timestamp=lambda: "2024-01-15 03:00:00",
            fetch=failing,
        )
    assert load_history(hist) == []  # retried next run


def test_dedup_predicate_trims_whitespace():
    assert already_acquired("2024-01-15 03:00:00", ["2024-01-15 03:00:00\n"])
    assert not already_acquired("2024-01-15 03:00:01", ["2024-01-15 03:00:00"])


def test_missing_history_file_is_empty(tmp_path):
    assert load_history(str(tmp_path / "nope.txt")) == []


def test_default_fetchers_fail_fast():
    with pytest.raises(NotImplementedError, match="no network"):
        acquire_once(history_file="/tmp/_unused_history.txt")


def test_filename_shape():
    assert dump_filename("2024-01-15 03:00:00") == "gcd-dump-2024-01-15_03-00-00.zip"
