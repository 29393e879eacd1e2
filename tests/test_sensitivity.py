"""Noise-under-test sensitivity parity in CI (VERDICT r1 item 5).

Reduced-size points from the leandvb_bench.sh series (reference
test/leandvb_bench.sh:52-83,119-134) on identical deterministic drand48
noise: our receiver must lock and achieve VBER within bounds set by the
reference binary's behavior on the same stimulus (full table:
docs/SENSITIVITY.md, measured with tools/bench_vber.py at 3000 pkts)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bench_vber import run_point  # noqa: E402


def test_sensitivity_linear_16db(ref_apps):
    """1.2 sps linear sampler at 16 dB: both receivers lock; our VBER
    within 4x of the reference's on identical noise (measured parity:
    1.2e-4..1.8e-4 ours vs 0.9e-4..1.8e-4 reference)."""
    ours = run_point("6/5", 16.0, {}, npackets=1200, minpackets=500)
    assert ours is not None, "no lock at 16 dB (linear)"
    ref = run_point("6/5", 16.0, {}, npackets=1200, minpackets=500,
                    use_ref=True)
    assert ref is not None, "reference did not lock at 16 dB"
    bound = max(4 * ref["vbermax"], 1e-3)
    assert ours["vbermax"] <= bound, (ours, ref)


def test_sensitivity_viterbi_10db(ref_apps):
    """1.2 sps Viterbi at 10 dB: error-free for both receivers
    (docs/SENSITIVITY.md row 3-4)."""
    ours = run_point("6/5", 10.0, {"viterbi": True},
                     npackets=900, minpackets=400)
    assert ours is not None, "no lock at 10 dB (viterbi)"
    assert ours["vbermax"] <= 1e-4, ours
