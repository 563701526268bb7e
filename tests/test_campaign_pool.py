"""Pooled campaign-parity regression guard (VERDICT r4 next #9).

Re-pools the COMMITTED per-day eval JSONs (projects/NC_EHZ/run6) with the
same arithmetic as scripts/nc_summarize.py and asserts the published pooled
detection rate. If a code change regresses the post chain and someone
re-runs the campaign, the committed JSONs change and this pins the
published claim to what is actually in git.
"""

import json
from pathlib import Path

import pytest

RUN = Path(__file__).resolve().parents[1] / "projects" / "NC_EHZ" / "run6"
DAYS = ["2017_274", "2017_275", "2017_276", "2017_277", "2017_278",
        "2017_279", "2017_280", "2017_281", "2017_282", "2017_283"]


def pool(thresh: str):
    n = m = rm = 0
    for day in DAYS:
        f = RUN / f"eval_{day}_g1.json"
        if not f.exists():
            pytest.skip(f"missing {f}")
        r = json.loads(f.read_text())[day].get(thresh)
        if r is None:
            pytest.skip(f"no thresh {thresh} row for {day}")
        n += r["n_usgs"]
        m += r["n_matched"]
        rm += r["ref_n_matched"]
    return n, m, rm


def test_pooled_detection_rate_at_operating_point():
    """The published round-5 claim: pooled 10-day detection rate at the
    0.25 operating point is 136/141 = 0.965, beating the reference GENIE's
    own shipped detections on the same days (132/141 = 0.936)."""
    n, m, rm = pool("0.25")
    assert n == 141, f"USGS event pool changed: {n}"
    assert rm == 132, f"reference matched pool changed: {rm}"
    assert m >= 136, f"published pooled rate regressed: {m}/{n} (claim 136)"


def test_pooled_rate_at_reference_threshold_floor():
    """At the reference's own operating point (0.35) the pooled rate must
    stay at the published parity level (132/141 = reference)."""
    n, m, _ = pool("0.35")
    assert m >= 132, f"0.35 pooled rate regressed: {m}/{n} (claim 132)"
