"""Golden tests: our TX chain vs the reference leandvbtx binary."""

import subprocess

import numpy as np
import pytest

from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.util.iofmt import read_iq


def test_tsgen_matches_reference(ref_apps, golden_dir):
    ref = np.fromfile(golden_dir / "ts300.bin", dtype=np.uint8)
    ours = tsgen.generate(300).reshape(-1)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("interp,rate", [(2, "1/2"), (2, "3/4"), (4, "1/2"),
                                         (2, "7/8"), (2, "2/3")])
def test_tx_iq_matches_reference(ref_apps, golden_dir, interp, rate):
    ts = (golden_dir / "ts300.bin").read_bytes()
    r = subprocess.run(
        [str(ref_apps / "leandvbtx"), "-f", str(interp), "--cr", rate],
        input=ts, capture_output=True, check=True)
    ref_iq = read_iq(r.stdout, "f32")

    packets = np.frombuffer(ts, dtype=np.uint8).reshape(-1, 188)
    cfg = dvbs_tx.TxConfig(rate=rate, interp=interp)
    our_iq = dvbs_tx.modulate(packets, cfg)

    assert our_iq.shape == ref_iq.shape, (our_iq.shape, ref_iq.shape)
    assert np.allclose(our_iq, ref_iq, atol=2e-4), (
        np.abs(our_iq - ref_iq).max())
