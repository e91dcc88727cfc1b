"""Regression tests for tools/driver_replay.py's state model.

Pin the two r6-verdict bugs: (1) a query whose newest record is a clean
rows-only row must not be reported by an older crash; (2) the staleness
anchor for an UNTRACKED artifact is its mtime, not git-commit-time 0
(which made every fresh green row look stale the moment the driver ran).
No Spark session needed.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "driver_replay", REPO / "tools" / "driver_replay.py"
)
driver_replay = importlib.util.module_from_spec(_spec)
sys.modules["driver_replay"] = driver_replay
_spec.loader.exec_module(driver_replay)


def test_newest_round_across_buckets():
    erred = {"q": [5]}
    rows_only = {"q": [6]}
    assert driver_replay._newest_round("q", erred) == 5
    assert driver_replay._newest_round("q", erred, rows_only) == 6
    assert driver_replay._newest_round("absent", erred, rows_only) == 0


def test_clean_rows_only_supersedes_old_error():
    """The r6 bug shape: pca_whiten errored in r5 but recorded a clean
    rows-only row in r6 — its current state is rows-only, not ERRORED."""
    erred = {"q": [5]}
    rows_only = {"q": [6]}
    assert not (
        driver_replay._newest_round("q", erred)
        >= driver_replay._newest_round("q", rows_only)
    )
    # And the converse: an error NEWER than any clean record still reports.
    erred2 = {"q": [6]}
    rows_only2 = {"q": [5]}
    assert driver_replay._newest_round("q", erred2) >= driver_replay._newest_round(
        "q", rows_only2
    )


def test_git_ct_untracked_falls_back_to_mtime(tmp_path):
    f = tmp_path / "CORRECTNESS_r99.json"
    f.write_text("{}")
    ct = driver_replay._git_ct(f)
    assert ct == int(f.stat().st_mtime) and ct > 0


def test_git_ct_missing_file_is_zero(tmp_path):
    assert driver_replay._git_ct(tmp_path / "nope.json") == 0


def test_real_history_has_no_live_errors():
    """With the committed r01–r06 artifacts, the only no-green-row queries
    are the 4 rows-only-by-design ones, and none is in a live-error state."""
    greens, rows_only, erred, artifacts = driver_replay._driver_history()
    assert len(artifacts) >= 6
    for name, rounds in erred.items():
        if name in greens:
            continue
        assert max(rounds) < driver_replay._newest_round(name, rows_only), (
            f"{name} reports a live error despite newer clean records"
        )
