"""Stream-order golden comparison against the reference binary under
noise, deterministic TEI/0x55 coverage, and the auto-notch birdie golden
(VERDICT r2 item 3; reference: dvb.h:1043-1046 + 1146-1156, sdr.h:46-154,
test/leandvb_bench.sh:52-83).

Float demodulators are NOT bit-identical under near-threshold noise (the
reference computes in x87/SSE float, we in XLA float32; symbol decisions
near the boundary flip), so the noisy golden characterizes the diff
precisely instead of demanding vacuous equality:

  * stream ORDER — every TS packet each decoder emits maps to a TX
    index, and those indices must be strictly increasing (no reorder,
    no duplicate) for BOTH decoders;
  * coverage — above lock, we recover at least as large a fraction of
    the reference's packets as the set-based golden demands, and every
    index decoded by both is byte-identical (both equal the TX packet);
  * failures — every emitted packet that matches NO TX payload must be
    a genuine marked RS failure (TEI bit set) or a pre-lock transient,
    and their count is bounded.

The TEI path itself is goldened deterministically with a 180-degree
phase-flip burst on an otherwise CLEAN stream: a flip is invisible to
AGC/PLL/timing (QPSK maps onto itself), so both decoders see identical
hard decisions, identical deconvolved bytes, identical RS failures —
the marked packets must match byte-for-byte including sync^0x55 / TEI.
"""

import subprocess
import sys

import numpy as np
import pytest

from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.util.iofmt import write_iq


from conftest import file_stdin as _file_stdin


def _run_ref(ref_apps, raw, extra=()):
    with _file_stdin(raw) as f:
        r = subprocess.run(
            [str(ref_apps / "leandvb"), "--f32", "-f", "4e6", "--sr",
             "2e6", "--cr", "1/2", "--fastlock", *extra],
            stdin=f, capture_output=True, check=True)
    return np.frombuffer(r.stdout, np.uint8).reshape(-1, 188)


def _run_ours(raw, extra=()):
    with _file_stdin(raw) as f:
        r = subprocess.run(
            [sys.executable, "-m", "leansdr_tpu.apps.leandvb", "--f32",
             "--float-scale", "75", "-f", "4e6", "--sr", "2e6", "--cr",
             "1/2", "--fastlock", *extra],
            stdin=f, capture_output=True, check=True)
    return np.frombuffer(r.stdout, np.uint8).reshape(-1, 188)


def _match(pkts, ts):
    m = np.full(len(ts), -1)
    for i, o in enumerate(ts):
        hit = np.where((pkts == o).all(axis=1))[0]
        if len(hit):
            m[i] = hit[0]
    return m


def _noisy(raw, awgn):
    r = subprocess.run(
        [sys.executable, "-m", "leansdr_tpu.apps.leanchansim", "--if32",
         "--of32", "--awgn", str(awgn), "--deterministic"],
        input=raw, capture_output=True, check=True)
    return r.stdout


def test_noisy_stream_order_golden(ref_apps):
    """Near-threshold AWGN, full emitted streams compared in order."""
    pkts = tsgen.generate(500)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    noisy = _noisy(write_iq(iq, "f32"), -13)

    ref = _run_ref(ref_apps, noisy, ("--anf", "0"))
    ours = _run_ours(noisy, ("--anf", "0"))

    mr, mo = _match(pkts, ref), _match(pkts, ours)
    ri, oi = mr[mr >= 0], mo[mo >= 0]
    # Stream order: strictly increasing TX indices, no dup, no reorder.
    assert (np.diff(ri) > 0).all(), "reference emitted out of order?!"
    assert (np.diff(oi) > 0).all(), "we emitted TS packets out of order"
    # Byte equality on the common set is by construction (both == TX);
    # coverage: at least 90% of the reference's recovery, and a real
    # overlap (not disjoint windows).
    common = set(ri.tolist()) & set(oi.tolist())
    assert len(common) >= 250, (len(ri), len(oi), len(common))
    assert len(oi) >= 0.9 * len(ri), (len(oi), len(ri))
    # Failures: unmatched emissions are marked RS failures (TEI) or
    # pre-lock transients, and there are few of them.
    for name, ts, m in (("ref", ref, mr), ("ours", ours, mo)):
        bad = np.where(m < 0)[0]
        assert len(bad) <= 12, (name, len(bad))
        first_good = np.where(m >= 0)[0][0]
        for i in bad:
            is_transient = i < first_good
            has_tei = bool(ts[i, 1] & 0x80)
            assert is_transient or has_tei, (name, i)


def test_rs_overload_burst_drop_golden(ref_apps):
    """Deterministic RS-overload burst: the 0x55-marking path, goldened
    by its OBSERVABLE behavior.

    The reference derandomizer DROPS every corrupted packet (the
    'output corrupted packets' branch is commented out,
    dvb.h:1152-1157); the sync^0x55 mark exists so the failures do not
    desynchronize the derandomizer. A 90-degree rotation burst (legal
    constellation points, so AGC/PLL/timing ride through it; the
    deconvolved bits in the span are deterministic garbage) overloads
    RS in exactly one interleaver depth of packets. Golden: BOTH
    decoders drop the IDENTICAL packet window and resume byte-exact
    immediately after it — which fails if the marking/TEI path ever
    mishandles a failed packet."""
    pkts = tsgen.generate(420)
    iq = dvbs_tx.modulate(
        pkts, dvbs_tx.TxConfig(rate="1/2", interp=2)).copy()
    b0, blen = 700_000, 2400       # ~150 contiguous garbage bytes
    seg = iq[b0:b0 + blen].copy()
    iq[b0:b0 + blen, 0] = -seg[:, 1]     # 90-degree rotation
    iq[b0:b0 + blen, 1] = seg[:, 0]
    raw = write_iq(iq, "f32")

    ref = _run_ref(ref_apps, raw, ("--anf", "0"))
    ours = _run_ours(raw, ("--anf", "0"))

    mr, mo = _match(pkts, ref), _match(pkts, ours)
    ri, oi = mr[mr >= 0], mo[mo >= 0]
    # Both decode to the end of the stream (the burst must not unlock).
    assert ri[-1] >= 400 and oi[-1] >= 400, (ri[-1], oi[-1])

    def gap(mi):
        g = np.where(np.diff(mi) != 1)[0]
        return [(int(mi[k]) + 1, int(mi[k + 1])) for k in g]

    rgap, ogap = gap(ri), gap(oi)
    # Exactly one mid-stream drop window, identical in both decoders,
    # one interleaver depth wide, covering the burst packet (~214).
    assert rgap == ogap, (rgap, ogap)
    assert len(rgap) == 1, rgap
    lo, hi = rgap[0]
    assert 10 <= hi - lo <= 17, rgap
    assert lo <= b0 // 3264 <= hi, (rgap, b0 // 3264)
    # Byte-exact resumption right after the window in BOTH (the marked
    # packets preserved the derandomizer phase), and no spurious
    # mid-stream emissions that match nothing.
    assert set(oi.tolist()) >= set(ri.tolist()), "we dropped extra"
    for name, ts, m in (("ref", ref, mr), ("ours", ours, mo)):
        first_good = np.where(m >= 0)[0][0]
        bad_mid = [i for i in np.where(m < 0)[0] if i >= first_good]
        assert bad_mid == [], (name, bad_mid)


def test_anf_birdie_golden(ref_apps):
    """auto_notch golden against the reference binary (sdr.h:46-154),
    INCLUDING the detection cadence: the reference's detect() first
    runs after decimation = 1024*4096 = 4.19M samples, so a birdie-
    poisoned stream must become decodable at packet ~1285 (4.19M /
    3264) in BOTH receivers — same detection point, same recovery —
    and be fatal to both without the notch."""
    pkts = tsgen.generate(1600)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    z = iq[:, 0] + 1j * iq[:, 1]
    n = np.arange(len(z))
    # In-band CW tone at +0.11 Fs, at signal RMS (tone power = 2x
    # signal power: fatal without the notch, clean removal with it).
    rms = float(np.sqrt(np.mean(np.abs(z) ** 2)))
    z = z + rms * np.exp(2j * np.pi * 0.11 * n)
    birdy = np.stack([z.real, z.imag], -1).astype(np.float32)
    raw = write_iq(birdy, "f32")

    ref2 = _run_ref(ref_apps, raw, ("--anf", "2"))
    ours2 = _run_ours(raw, ("--anf", "2"))
    mr, mo = _match(pkts, ref2), _match(pkts, ours2)
    ri, oi = mr[mr >= 0], mo[mo >= 0]
    # Reference locks right after its first notch detection...
    assert len(ri) >= 150, f"reference did not recover: {len(ri)}"
    assert 1285 <= ri[0] <= 1340, ri[0]
    # ...and so do we: the SAME detection cadence (measured: both first
    # match packet 1296 on this stimulus), equivalent recovery, and
    # strictly in-order output.
    assert abs(int(oi[0]) - int(ri[0])) <= 16, (oi[0], ri[0])
    assert len(oi) >= 0.85 * len(ri), (len(oi), len(ri))
    assert (np.diff(oi) > 0).all()

    # Negative control on a short prefix: without the notch the birdie
    # is fatal for both (they never lock at all).
    cut = 600 * 3264 * 8            # 600 packets of f32 IQ bytes
    ref0 = _run_ref(ref_apps, raw[:cut], ("--anf", "0"))
    ours0 = _run_ours(raw[:cut], ("--anf", "0"))
    assert int((_match(pkts, ref0) >= 0).sum()) == 0, len(ref0)
    assert int((_match(pkts, ours0) >= 0).sum()) == 0, len(ours0)
