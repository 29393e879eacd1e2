"""Multi-channel batching and multi-chip sharding tests (8-device CPU
mesh per conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leansdr_tpu.dsp import receiver
from leansdr_tpu.dsp.cstln import Predef, make_dvbs2_constellation
from leansdr_tpu.parallel import mesh as pmesh
from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.pipelines.dvbs_rx import RxConfig
from leansdr_tpu.pipelines.multi_rx import MultiDvbsReceiver


def _stimulus(nchan, npackets=150, seed0=0, rate="1/2"):
    """Independent DVB-S signals per channel (different payloads)."""
    iqs, payloads = [], []
    for c in range(nchan):
        pkts = tsgen.generate(npackets, start=seed0 + 1000 * c)
        iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate=rate, interp=2))
        iqs.append(iq)
        payloads.append(pkts)
    n = min(len(q) for q in iqs)
    return np.stack([q[:n] for q in iqs]), payloads


def test_multi_channel_batch_decodes_all():
    nchan = 4
    x, payloads = _stimulus(nchan)
    rx = MultiDvbsReceiver(
        RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                 float_scale=75.0, exact_lut=False),
        nchan, use_pallas=False)
    outs = [np.empty((0, 188), np.uint8)] * nchan
    for i in range(0, x.shape[1], 1 << 16):
        res = rx.process(x[:, i:i + (1 << 16)])
        outs = [np.concatenate([a, b]) for a, b in zip(outs, res)]
    for c in range(nchan):
        assert len(outs[c]) >= 80, f"channel {c}: {len(outs[c])}"
        hits = sum(1 for o in outs[c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 0.95 * len(outs[c]), f"channel {c}"


def test_sharded_demod_matches_single_device():
    """The shard_map channel-sharded step must produce the same symbols
    as the unsharded batched scan."""
    ndev = len(jax.devices())
    assert ndev == 8
    nchan = ndev * 2
    x, _ = _stimulus(nchan, npackets=30)
    n = (x.shape[1] - 1) // 128 * 128
    xd = jnp.asarray(x[:, :n + 1] * 75.0)

    cstln = make_dvbs2_constellation(Predef.QPSK, "1/2")
    params = receiver.ReceiverParams(omega=2.0, sampler="linear",
                                     nsymbols=4, exact_lut=False)
    tables = receiver.make_tables(cstln)
    state = receiver.init_state(params, nchan)

    st1, out1 = receiver.run_chunks(params, tables, state, xd)

    m = pmesh.make_channel_mesh(jax.devices())
    step = pmesh.sharded_demod_step(params, m)
    st2, out2, mean_mer = step(tables, state, xd)

    # Different shard compilations fuse float ops differently, and the
    # PLL/timing loop amplifies ulp differences chaotically — so exact
    # equality is not expected. Require instead that every sharded
    # channel demodulates VALIDLY: near-zero algebraic deconvolution
    # errors for the best sync hypothesis in steady state, and symbol
    # counts matching the unsharded run closely.
    from leansdr_tpu.fec import deconv
    v1 = np.asarray(out1["valid"]).sum(axis=1)
    v2 = np.asarray(out2["valid"]).sum(axis=1)
    assert (np.abs(v1 - v2) <= 0.01 * v1).all()
    sym2 = np.asarray(out2["symbol"])
    val2 = np.asarray(out2["valid"])
    for c in range(nchan):
        s = sym2[c][val2[c]][-4096:]
        errs = min(deconv.deconvolve_errors(s, "1/2", k) for k in range(4))
        assert errs < 10, f"channel {c}: {errs} deconv errors"
    assert np.isfinite(float(mean_mer))
    assert float(mean_mer) > 10.0     # clean signal, locked loops


def test_time_sharded_fir_halo_exchange():
    """Overlap-save FIR over the time axis with ppermute halos must equal
    the unsharded causal convolution."""
    from leansdr_tpu.parallel import halo
    from leansdr_tpu.dsp import filtergen
    rng = np.random.default_rng(0)
    n = 8 * 4096
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    coeffs = filtergen.root_raised_cosine(32, 0.25, 0.35)

    m = halo.make_time_mesh(jax.devices())
    fir = halo.sharded_fir(coeffs, m)
    y = np.asarray(fir(jnp.asarray(x)))

    ref = np.convolve(x, coeffs)[:n]
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_candidate_scan_elects_true_config_grid():
    """A reference-scale 4 SR x 5 CR grid (leansdrscan.cc's cartesian
    sweep) races as ONE device batch — distinct symbol rates on the
    channel axis, one byte chain per candidate — and the true config
    wins by the reference's output-production rule."""
    from leansdr_tpu.pipelines.scan_rx import CandidateScanReceiver
    pkts = tsgen.generate(300)
    # True signal: 2 Msym/s at 4 Msps, rate 3/4.
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="3/4", interp=2)) * 75.0
    srs = [1e6, 4e6 / 3, 2e6, 2.5e6]
    crs = ["1/2", "2/3", "3/4", "5/6", "7/8"]
    rx = CandidateScanReceiver.grid(Fs=4e6, symbol_rates=srs, rates=crs)
    assert len(rx.candidates) == 20 and len(rx.group_fms) == 4
    for i in range(0, len(iq), 1 << 16):
        win = rx.process(iq[i:i + (1 << 16)])  # winner() is sticky
    true_idx = srs.index(2e6) * len(crs) + crs.index("3/4")
    assert win == true_idx, f"winner {win} != {true_idx}"
    hits = sum(1 for o in rx.outputs[win]
               if (pkts == o).all(axis=1).any())
    assert hits >= 50
    # No wrong-hypothesis chain may produce output.
    assert all(len(rx.outputs[c]) == 0
               for c in range(20) if c != true_idx)


def test_multi_channel_viterbi_decodes_all():
    """cfg.viterbi=True must route through the device Pallas/interpret
    ACS bank (MultiViterbiSync), not fall back to algebraic
    deconvolution, and still decode every channel's TS."""
    nchan = 3
    x, payloads = _stimulus(nchan, npackets=150)
    rx = MultiDvbsReceiver(
        RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                 float_scale=75.0, exact_lut=False, viterbi=True),
        nchan, use_pallas=False)
    from leansdr_tpu.fec.viterbi_device import MultiViterbiSync
    assert isinstance(rx.deconv, MultiViterbiSync)
    outs = [np.empty((0, 188), np.uint8)] * nchan
    for i in range(0, x.shape[1], 1 << 16):
        res = rx.process(x[:, i:i + (1 << 16)])
        outs = [np.concatenate([a, b]) for a, b in zip(outs, res)]
    for c in range(nchan):
        assert len(outs[c]) >= 60, f"channel {c}: {len(outs[c])}"
        hits = sum(1 for o in outs[c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 0.95 * len(outs[c]), f"channel {c}"


def test_multi_channel_oversized_chunk_split_append():
    """Feeding dispatch() a chunk larger than the ring's per-append
    sizing (plan.nsamp) must split the append along time instead of
    overflowing the ring, and decode the same packets as nominal-size
    feeding."""
    nchan = 2
    x, payloads = _stimulus(nchan, npackets=120)
    cfg = RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                   float_scale=75.0, exact_lut=False)
    outs = {}
    for step in (1 << 15, 1 << 17):      # nominal and 4x-oversized
        rx = MultiDvbsReceiver(cfg, nchan, use_pallas=False,
                               chunk_samples=1 << 15)
        acc = [np.empty((0, 188), np.uint8)] * nchan
        for i in range(0, x.shape[1], step):
            res = rx.process(x[:, i:i + step])
            acc = [np.concatenate([a, b]) for a, b in zip(acc, res)]
        outs[step] = acc
    for c in range(nchan):
        assert len(outs[1 << 17][c]) >= 60
        np.testing.assert_array_equal(outs[1 << 15][c],
                                      outs[1 << 17][c])
        hits = sum(1 for o in outs[1 << 17][c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 0.95 * len(outs[1 << 17][c]), f"channel {c}"


def test_multi_channel_pipelined_submit_matches_process():
    """submit()/flush() (threaded fetch + backend) must decode the same
    packets as the synchronous process() path."""
    nchan = 2
    x, payloads = _stimulus(nchan, npackets=120)
    cfg = RxConfig(Fs=4e6, Fm=2e6, rate="1/2", fastlock=True,
                   float_scale=75.0, exact_lut=False)
    outs = {}
    for mode in ("sync", "pipe"):
        rx = MultiDvbsReceiver(cfg, nchan, use_pallas=False)
        acc = [np.empty((0, 188), np.uint8)] * nchan
        for i in range(0, x.shape[1], 1 << 16):
            chunk = x[:, i:i + (1 << 16)]
            batches = ([rx.process(chunk)] if mode == "sync"
                       else rx.submit(chunk))
            for res in batches:
                acc = [np.concatenate([a, b]) for a, b in zip(acc, res)]
        if mode == "pipe":
            for res in rx.flush():
                acc = [np.concatenate([a, b]) for a, b in zip(acc, res)]
        outs[mode] = acc
    for c in range(nchan):
        assert len(outs["pipe"][c]) >= 60
        np.testing.assert_array_equal(outs["sync"][c], outs["pipe"][c])
        hits = sum(1 for o in outs["pipe"][c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 0.95 * len(outs["pipe"][c]), f"channel {c}"


@pytest.mark.parametrize("rate", ["3/4", "7/8"])
def test_multi_channel_punctured_rates(rate):
    """The batched deconvolver must handle punctured rates (multiple
    deconvolution polynomials per puncturing period)."""
    from leansdr_tpu.pipelines.multi_rx import MultiDvbsReceiver
    nchan = 2
    x, payloads = _stimulus(nchan, npackets=260, rate=rate)
    rx = MultiDvbsReceiver(
        RxConfig(Fs=4e6, Fm=2e6, rate=rate, fastlock=True,
                 float_scale=75.0, exact_lut=False),
        nchan, use_pallas=False)
    outs = [np.empty((0, 188), np.uint8)] * nchan
    for i in range(0, x.shape[1], 1 << 16):
        res = rx.process(x[:, i:i + (1 << 16)])
        outs = [np.concatenate([a, b]) for a, b in zip(outs, res)]
    for c in range(nchan):
        hits = sum(1 for o in outs[c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 60, f"channel {c}: {hits} of {len(outs[c])}"


def test_time_sharded_ring_demod_exact_state_handoff():
    """parallel/timeshard.py: D streams' blocks laid out diagonally over
    the ring, loop state ppermuted between sequential block owners each
    superstep. The recurrence must be honored EXACTLY: symbols identical
    to the unsharded batched run (exact_lut deterministic path)."""
    import jax.numpy as jnp
    from leansdr_tpu.parallel import halo, timeshard

    D = 8
    x, _ = _stimulus(D, npackets=40)
    params = receiver.ReceiverParams(omega=2.0, sampler="linear",
                                     nsymbols=4, exact_lut=True)
    cstln = make_dvbs2_constellation(Predef.QPSK, "1/2")
    tables = receiver.make_tables(cstln)
    B = 16 * receiver.CHUNK
    ra = params.readahead
    n = (x.shape[1] - ra) // B * B
    xs = (x[:, :n + ra] * 75.0).astype(np.float32)

    st1, out1 = receiver.run_chunks(params, tables,
                                    receiver.init_state(params, D),
                                    jnp.asarray(xs))

    m = halo.make_time_mesh(jax.devices())
    fn = timeshard.ring_stream_demod(params, m)
    ins = timeshard.diagonal_layout(xs, B, ra)
    stF, outs = fn(tables, receiver.init_state(params, D),
                   jnp.asarray(ins))
    S = n // B
    sym = timeshard.undiagonal(np.asarray(outs["symbol"]), D)
    val = timeshard.undiagonal(np.asarray(outs["valid"]), D)
    np.testing.assert_array_equal(sym.reshape(D, n),
                                  np.asarray(out1["symbol"])[:, :n])
    np.testing.assert_array_equal(val.reshape(D, n),
                                  np.asarray(out1["valid"])[:, :n])


def test_multi_channel_viterbi_punctured_rate_decodes():
    """Punctured-rate fleets (--viterbi --cr 3/4) route through the
    all-rate XLA-scan ACS (viterbi_decode_xla) and decode to TS."""
    nchan = 2
    x, payloads = _stimulus(nchan, npackets=200, rate="3/4")
    rx = MultiDvbsReceiver(
        RxConfig(Fs=4e6, Fm=2e6, rate="3/4", fastlock=True,
                 float_scale=75.0, exact_lut=False, viterbi=True),
        nchan, use_pallas=False)
    assert rx.deconv.kind == "viterbi_xla"
    outs = [np.empty((0, 188), np.uint8)] * nchan
    for i in range(0, x.shape[1], 1 << 16):
        res = rx.process(x[:, i:i + (1 << 16)])
        outs = [np.concatenate([a, b]) for a, b in zip(outs, res)]
    for c in range(nchan):
        assert len(outs[c]) >= 60, f"channel {c}: {len(outs[c])}"
        hits = sum(1 for o in outs[c]
                   if (payloads[c] == o).all(axis=1).any())
        assert hits >= 0.95 * len(outs[c]), f"channel {c}"
