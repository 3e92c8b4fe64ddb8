"""README <-> driver-bench consistency: the quoted bands must contain
the latest driver-captured BENCH_r{N}.json medians.

Rounds 3 and 4 both shipped README headline numbers whose spreads were
disjoint from the driver's independent run of the same code (tunnel
cross-session drift). This test makes that structurally impossible: the
README now quotes an explicit cross-session band per metric, and this
test fails if the newest BENCH_r{N}.json median falls outside it.

Only BENCH files produced by the round-5+ bench.py (detected by the
presence of the sharded metric, added in round 5 together with the
transfer-probe fix) are checked — older files measured with the old
probe are a different quantity by construction.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# README row label (regex-escaped match on the table row) -> bench metric
ROWS = {
    "trot @ 2048, Ndiffuse=2": "go2_trot_solve_hz_nsample2048_ndiffuse2",
    "trot sharded, 1-device mesh": "go2_trot_sharded_mesh1_solve_hz_nsample2048_ndiffuse2",
    "seq-jump @ 8192, Ndiffuse=1 (north star)": "go2_seq_jump_solve_hz_nsample8192_ndiffuse1",
}


def _latest_bench():
    files = sorted(
        f for f in os.listdir(REPO) if re.fullmatch(r"BENCH_r\d+\.json", f)
    )
    if not files:
        return None
    with open(os.path.join(REPO, files[-1])) as f:
        return json.load(f)


def _bench_metrics(doc):
    """metric -> median Hz from a driver BENCH file (parses the cmd tail)."""
    out = {}
    for line in doc.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                d = json.loads(line)
                out[d["metric"]] = float(d["value"])
            except (ValueError, KeyError):
                continue
    # some driver formats keep only the parsed last line
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        p = doc["parsed"]
        if "metric" in p:
            out.setdefault(p["metric"], float(p["value"]))
    return out


def _readme_bands():
    """README row label -> (lo, hi) cross-session band."""
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    bands = {}
    for label in ROWS:
        # | label | **637**, 719 | 510-860 | ...
        pat = re.escape(label) + r"\s*\|[^|]*\|\s*(\d+)-(\d+)\s*\|"
        m = re.search(pat, text)
        if m:
            bands[label] = (float(m.group(1)), float(m.group(2)))
    return bands


def test_readme_bands_contain_latest_driver_bench():
    doc = _latest_bench()
    if doc is None:
        pytest.skip("no BENCH_r*.json present")
    metrics = _bench_metrics(doc)
    if ROWS["trot sharded, 1-device mesh"] not in metrics:
        pytest.skip(
            "latest BENCH predates the round-5 bench.py (old transfer probe)"
        )
    bands = _readme_bands()
    assert len(bands) == len(ROWS), (
        f"README 'Current numbers' table rows not found/parsable: "
        f"have {sorted(bands)}, want {sorted(ROWS)}"
    )
    for label, metric in ROWS.items():
        lo, hi = bands[label]
        med = metrics.get(metric)
        assert med is not None, f"driver bench lacks metric {metric}"
        assert lo <= med <= hi, (
            f"driver-captured {metric} = {med} Hz is outside the README's "
            f"cross-session band {lo}-{hi}; update the README (and widen "
            f"the band honestly) instead of leaving a stale claim"
        )


def test_readme_bands_are_sane():
    """Bands must bracket the quoted medians (catches typos when updating)."""
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    bands = _readme_bands()
    for label, (lo, hi) in bands.items():
        m = re.search(re.escape(label) + r"\s*\|\s*\*\*(\d+)\*\*", text)
        assert m, f"no bold median found for README row {label!r}"
        med = float(m.group(1))
        assert lo < med < hi, f"{label}: median {med} outside own band {lo}-{hi}"
