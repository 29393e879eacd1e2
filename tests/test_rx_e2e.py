"""End-to-end receiver tests: our TX -> our RX, and steady-state golden
comparison against the reference leandvb binary on identical stimulus
(SURVEY.md section 4.5 items 1-2)."""

import subprocess

import numpy as np
import pytest

from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.pipelines.dvbs_rx import DvbsReceiver, RxConfig
from leansdr_tpu.util.iofmt import write_iq


def _decode_stream(rx, iq, chunk=1 << 16):
    outs = []
    for i in range(0, len(iq), chunk):
        outs.append(rx.process(iq[i:i + chunk]))
    return np.concatenate(outs) if outs else np.empty((0, 188), np.uint8)


def _match_indices(pkts, ts):
    m = np.full(len(ts), -1)
    for i, o in enumerate(ts):
        hit = np.where((pkts == o).all(axis=1))[0]
        if len(hit):
            m[i] = hit[0]
    return m


@pytest.mark.parametrize("rate", ["1/2", "3/4"])
def test_loopback_decodes_contiguous_stream(rate):
    npk = 280
    pkts = tsgen.generate(npk)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate=rate, interp=2))
    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate=rate, fastlock=True,
                               float_scale=75.0))
    out = _decode_stream(rx, iq)
    assert rx.lock
    m = _match_indices(pkts, out)
    good = m >= 0
    assert good.sum() >= 180, f"only {good.sum()} packets decoded"
    idx = m[good]
    # Contiguous run ending at the last generated packet.
    assert idx[-1] == npk - 1 - 12  # interleaver+deconv keep tail queued
    assert (np.diff(idx) == 1).all()


@pytest.mark.parametrize("rate", ["1/2", "3/4", "5/6", "7/8"])
def test_rx_steady_state_matches_leandvb(ref_apps, rate):
    """Above lock, our TS byte stream must equal the reference's exactly:
    both decoders' packet sequences agree on every packet index both
    emitted (BASELINE.json: 'TS output bit-exact ... above threshold')."""
    pkts = tsgen.generate(320)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate=rate, interp=2))

    raw = write_iq(iq, "f32")
    from conftest import file_stdin
    with file_stdin(raw) as f:
        r = subprocess.run(
            [str(ref_apps / "leandvb"), "--f32", "-f", "4e6", "--sr",
             "2e6", "--cr", rate, "--anf", "0", "--fastlock"],
            stdin=f, capture_output=True, check=True)
    ref_ts = np.frombuffer(r.stdout, dtype=np.uint8).reshape(-1, 188)

    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate=rate, fastlock=True))
    out = _decode_stream(rx, iq)

    m_ours = _match_indices(pkts, out)
    m_ref = _match_indices(pkts, ref_ts)
    ours_set = set(m_ours[m_ours >= 0].tolist())
    ref_set = set(m_ref[m_ref >= 0].tolist())
    common = ours_set & ref_set
    assert len(common) >= 180, (len(ours_set), len(ref_set))
    # Decoded packets are bit-exact by construction of the match; also
    # require we recover at least 90% of what the reference recovers.
    assert len(ours_set) >= 0.9 * len(ref_set), (len(ours_set), len(ref_set))


def test_coarse_carrier_acquisition_beyond_pll_range():
    """The FFT coarse search must recover a frequency offset far outside
    the PLL capture range, and seeding Ftune with it must let the
    receiver lock (the additive acquisition accelerator)."""
    from leansdr_tpu.dsp.acquisition import coarse_carrier_estimate
    from leansdr_tpu.dsp.blocks import Rotator

    pkts = tsgen.generate(160)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    # Shift by 3% of Fs (120 kHz; estimator-accuracy check — the CLI
    # test in test_apps_cli.py covers a beyond-clamp 8% offset).
    offset = 0.03
    rot = Rotator(offset)
    z = rot.process(iq[:, 0] + 1j * iq[:, 1])
    x = np.stack([z.real, z.imag], -1).astype(np.float32) * 75.0

    est = coarse_carrier_estimate(x, msymbols=4)
    assert abs(est - offset) < 1e-3, est

    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                               Ftune=est * 4e6))
    out = _decode_stream(rx, x)
    m = _match_indices(pkts, out)
    assert (m >= 0).sum() >= 80


def test_checkpoint_resume_exact():
    """Serializing mid-stream and resuming in a NEW receiver must produce
    exactly the TS packets of an uninterrupted run (SURVEY.md 5.4)."""
    pkts = tsgen.generate(160)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    cfg = RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                   float_scale=75.0)

    rx_ref = DvbsReceiver(cfg)
    full = _decode_stream(rx_ref, iq, chunk=1 << 16)

    half = (len(iq) // 2) // (1 << 16) * (1 << 16)
    rx_a = DvbsReceiver(cfg)
    out_a = _decode_stream(rx_a, iq[:half], chunk=1 << 16)
    blob = rx_a.save_state()

    rx_b = DvbsReceiver(cfg)
    rx_b.load_state(blob)
    out_b = _decode_stream(rx_b, iq[half:], chunk=1 << 16)

    resumed = np.concatenate([out_a, out_b])
    np.testing.assert_array_equal(resumed, full)


def test_viterbi_path_decodes():
    """--viterbi end to end: trellis ACS (device path) + sync election
    through the full chain."""
    pkts = tsgen.generate(150)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate="1/2", viterbi=True,
                               fastlock=True, float_scale=75.0))
    out = _decode_stream(rx, iq)
    m = _match_indices(pkts, out)
    assert (m >= 0).sum() >= 80, (m >= 0).sum()


def test_fast_rrc_mf_prefilter_decodes():
    """sampler=rrc with the computed fast path must route through the
    matched-filter prefilter + linear-sampler demod (dsp/mf_prefilter.py)
    and decode the stream (VERDICT r1 item 3: --hq must have a fast
    path)."""
    pkts = tsgen.generate(160)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                               float_scale=75.0, exact_lut=False,
                               sampler="rrc"))
    assert rx.mf_taps is not None and rx.params.sampler == "linear"
    out = _decode_stream(rx, iq)
    m = _match_indices(pkts, out)
    assert (m >= 0).sum() >= 100, (m >= 0).sum()


def test_cli_reaches_mosaic_kernel_on_tpu(monkeypatch):
    """The production CLI surface must select the Pallas kernel on a TPU
    backend — both the default config and --hq (VERDICT r1 item 3)."""
    import jax
    from leansdr_tpu.apps.leandvb import parse_args
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    cfg, _ = parse_args(["--f32", "-f", "4e6", "--sr", "2e6",
                         "--fastlock", "--anf", "0"])
    assert DvbsReceiver(cfg).use_pallas

    cfg, _ = parse_args(["--f32", "-f", "4e6", "--sr", "2e6",
                         "--hq", "--anf", "0"])
    rx = DvbsReceiver(cfg)
    assert rx.use_pallas and rx.mf_taps is not None

    # --exact-lut forces the bit-exact scan path even on TPU.
    cfg, _ = parse_args(["--f32", "-f", "4e6", "--sr", "2e6",
                         "--exact-lut", "--anf", "0"])
    assert not DvbsReceiver(cfg).use_pallas


def _hs_stimulus(npk=240):
    """u8-quantized stimulus for the --hs integer path (the CLI recipe:
    leandvbtx --power 37.5 --agc -> chansim --ou8 -> leandvb --u8 --hs)."""
    from leansdr_tpu.util.iofmt import read_iq
    pkts = tsgen.generate(npk)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(
        amp=dvbs_tx.power_to_amp(37.5), agc=True, interp=2))
    wire = write_iq(iq, "u8")
    return pkts, read_iq(wire, "u8")


def test_hs_path_decodes_and_reports():
    """--hs end to end: integer fast-QPSK demod, deconv, framing; freq
    and cstln_out metrics populated (VERDICT r1 weak 6)."""
    pkts, iq = _hs_stimulus()
    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate="1/2", hs=True,
                               fastlock=True, want_const=True,
                               Finfo=50.0))   # ~0.2 s of signal -> ~9 meas
    out = _decode_stream(rx, iq)
    m = _match_indices(pkts, out)
    assert (m >= 0).sum() >= 100, (m >= 0).sum()
    assert len(rx.meas["freq"]) > 0
    pts = np.asarray(rx.sampled_points)
    assert len(pts) > 10
    # Locked QPSK: sampled points cluster on a ring (radius set by the
    # TX AGC of the u8 stimulus, ~28 here), not scattered like noise.
    r = np.hypot(pts[-10:, 0], pts[-10:, 1])
    assert r.mean() > 10 and r.std() < 0.25 * r.mean(), r


@pytest.mark.parametrize("mode", ["viterbi", "hs", "pallas"])
def test_checkpoint_resume_exact_variants(mode):
    """save_state/load_state must be exact on the --viterbi, --hs and
    Pallas-kernel paths too (VERDICT r1 weak 5)."""
    if mode == "hs":
        pkts, iq = _hs_stimulus(160)
        cfg = RxConfig(Fs=4e6, Fm=2e6, rate="1/2", hs=True,
                       fastlock=True)
    else:
        pkts = tsgen.generate(120)
        iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2",
                                                     interp=2))
        cfg = RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                       float_scale=75.0,
                       viterbi=(mode == "viterbi"),
                       exact_lut=(mode != "pallas"),
                       use_pallas=(True if mode == "pallas" else None))

    full = _decode_stream(DvbsReceiver(cfg), iq, chunk=1 << 16)

    half = (len(iq) // 2) // (1 << 16) * (1 << 16)
    rx_a = DvbsReceiver(cfg)
    out_a = _decode_stream(rx_a, iq[:half], chunk=1 << 16)
    blob = rx_a.save_state()
    rx_b = DvbsReceiver(cfg)
    rx_b.load_state(blob)
    out_b = _decode_stream(rx_b, iq[half:], chunk=1 << 16)

    np.testing.assert_array_equal(np.concatenate([out_a, out_b]), full)
    assert len(full) >= 40


def test_unlock_relock_through_noise_burst_nonfastlock():
    """Lock-boundary behavior under noise (VERDICT r1 weak 4): a
    mid-stream noise burst must break MPEG lock, drive the non-fastlock
    resync machinery (deconvol next_sync rotation on sync-byte failure,
    ref dvb.h:262-281 + watchdog dvb.h:802-838), and the receiver must
    re-acquire and decode a contiguous error-free run after the burst."""
    npk = 480
    pkts = tsgen.generate(npk)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=2))
    n = len(iq)
    o, ln = int(n * 0.45), int(n * 0.06)
    rng = np.random.default_rng(7)
    rms = float(np.sqrt((iq ** 2).mean()))
    iq = iq.copy()
    iq[o:o + ln] = rng.normal(scale=2 * rms,
                              size=(ln, 2)).astype(np.float32)

    rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate="1/2",
                               fastlock=False, float_scale=75.0))
    outs, locks = [], []
    step = 1 << 16
    for i in range(0, n, step):
        outs.append(rx.process(iq[i:i + step]))
        locks.append(bool(rx.lock))
    out = np.concatenate(outs)

    locks = np.asarray(locks)
    first_lock = int(np.argmax(locks))
    assert locks.any(), "never locked"
    assert not locks[first_lock:].all(), "burst did not break lock"
    assert locks[-1], "did not re-lock after the burst"

    m = _match_indices(pkts, out)
    idx = m[m >= 0]
    assert len(idx), "nothing decoded"
    # Packets from after the burst present, in order, up to the tail
    # the interleaver/deconv latency keeps queued.
    post = idx[idx > int(npk * 0.55)]
    assert len(post) >= 100, f"only {len(post)} post-burst packets"
    assert (np.diff(post) == 1).all()
    assert post[-1] >= npk - 1 - 14
