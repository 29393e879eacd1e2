"""Observability parity with the reference CLI (VERDICT r3 item 7):

* `-d` per-packet RS glyph stream (`_` clean / `.` corrected / `!`
  uncorrectable, dvb.h:1029-1038) — goldened by COUNT against the
  reference binary on a deterministic stimulus (a 90-degree rotation
  burst maps QPSK onto itself, so both decoders see identical hard
  decisions and identical RS outcomes; cf. the RS-overload golden).
* `--fd-pp` preprocessed-IQ tap (leandvb.cc:418-422), goldened
  byte-for-byte against the reference binary.
* `--version` (leandvb.cc:1073-1075) and `--duration` flag acceptance.
"""

import re
import subprocess
import sys

import numpy as np

from conftest import file_stdin
from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.util.iofmt import write_iq


def _glyph_counts(stderr: bytes):
    """Count RS glyphs, ignoring text lines and inline non-glyph tokens
    (the reference's 'Locked', '(xx)' bad-sync marks, '{a->b}' election
    prints share the stream)."""
    s = stderr.decode(errors="replace")
    s = re.sub(r"\([0-9a-f]{2}\)", "", s)
    s = re.sub(r"\{-?\d+->-?\d+\}", "", s)
    s = re.sub(r"%\d+", "", s)
    glyphs = "".join(l for l in s.splitlines()
                     if l and not re.search(r"[A-Za-z]", l))
    return {c: glyphs.count(c) for c in "_.!"}


def _burst_stimulus():
    pkts = tsgen.generate(420)
    iq = dvbs_tx.modulate(
        pkts, dvbs_tx.TxConfig(rate="1/2", interp=2)).copy()
    b0, blen = 700_000, 2400
    seg = iq[b0:b0 + blen].copy()
    iq[b0:b0 + blen, 0] = -seg[:, 1]        # 90-degree rotation burst
    iq[b0:b0 + blen, 1] = seg[:, 0]
    return write_iq(iq, "f32")


def test_rs_glyphs_golden(ref_apps):
    raw = _burst_stimulus()
    args = ["--f32", "-f", "4e6", "--sr", "2e6", "--cr", "1/2",
            "--fastlock", "--anf", "0", "-d"]
    with file_stdin(raw) as f:
        r = subprocess.run([str(ref_apps / "leandvb"), *args],
                           stdin=f, capture_output=True, check=True)
    with file_stdin(raw) as f:
        o = subprocess.run(
            [sys.executable, "-m", "leansdr_tpu.apps.leandvb",
             "--float-scale", "1", *args],
            stdin=f, capture_output=True, check=True)
    cr, co = _glyph_counts(r.stderr), _glyph_counts(o.stderr)
    # Mid-burst hard decisions are identical (the rotation maps QPSK
    # onto itself) so the failure window matches; the 1-2 packets at
    # the burst EDGES are float-sensitive (the linear sampler
    # interpolates across the rotation discontinuity), so counts are
    # compared with a +-3 boundary tolerance while the total packet
    # count must match exactly.
    assert cr["!"] > 0 and cr["."] > 0, cr
    assert sum(co.values()) == sum(cr.values()), (co, cr)
    assert abs(co["!"] - cr["!"]) <= 3, (co, cr)
    assert abs(co["."] - cr["."]) <= 2, (co, cr)
    assert abs(co["_"] - cr["_"]) <= 4, (co, cr)
    # Legend printed once (leandvb.cc:700-707).
    assert b"error-corrected packet" in o.stderr


def test_fd_pp_golden(ref_apps, tmp_path):
    """--fd-pp bytes equal the reference's byte-for-byte: with scale +
    decimation only, both pipelines do the same exact f32 arithmetic."""
    pkts = tsgen.generate(40)
    iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate="1/2", interp=4))
    raw = write_iq(iq, "f32")
    args = ["--f32", "-f", "8e6", "--sr", "2e6", "--cr", "1/2",
            "--decim", "2", "--fd-pp", "3"]

    def run(cmd, extra=()):
        import os
        out = tmp_path / "pp.bin"
        with file_stdin(raw) as f, open(out, "wb") as ppf:
            # Dup the capture file onto fd 3 in the child.
            fd = ppf.fileno()
            p = subprocess.Popen(
                [*cmd, *extra, *args], stdin=f,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                close_fds=False, preexec_fn=lambda: os.dup2(fd, 3))
            p.wait()
            assert p.returncode == 0
        return np.fromfile(out, np.float32)

    ref = run([str(ref_apps / "leandvb")])
    ours = run([sys.executable, "-m", "leansdr_tpu.apps.leandvb"],
               ("--float-scale", "1"))
    n = min(len(ref), len(ours))
    assert n > 100_000
    assert (ref[:n] == ours[:n]).all()
    assert abs(len(ref) - len(ours)) < 8192


def test_version_and_duration():
    r = subprocess.run(
        [sys.executable, "-m", "leansdr_tpu.apps.leandvb", "--version"],
        capture_output=True, text=True)
    assert r.returncode == 0 and r.stdout.startswith("leansdr-tpu-")
    # --duration accepted (GUI timeline width, leandvb.cc:1176): parse
    # must not fail; feed empty stdin so the run exits immediately.
    r = subprocess.run(
        [sys.executable, "-m", "leansdr_tpu.apps.leandvb", "--duration",
         "30", "--f32"],
        input=b"", capture_output=True)
    assert r.returncode == 0, r.stderr[-300:]
