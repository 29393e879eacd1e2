"""PMP zero-copy buffer descriptors (reference leaniiorx.cc:60-151,
leanmlmrx.cc:353-376).

The reference's homegrown shared-memory transport for SDR-rate data on
PlutoSDR-class hardware: instead of copying samples through a pipe, the
producer publishes {magic 'PMP1', physaddr, size, canary} descriptors and
the consumer mmaps /dev/mem and validates the canary.

On TPU hosts the equivalent transport is device-resident/donated buffers
and double-buffered host->device transfers (SURVEY.md section 2.10 P8),
but the wire format is implemented here so PMP-emitting hardware
frontends interoperate: descriptors can be parsed, and where /dev/mem is
accessible the referenced buffers can be mapped.
"""

import mmap
import os
import struct
from dataclasses import dataclass

PMP_MAGIC = 0x504D5031            # 'PMP1'
_FMT = "<IQQI"                    # magic, physaddr, size, canary
DESC_SIZE = struct.calcsize(_FMT)


@dataclass
class PmpDescriptor:
    physaddr: int
    size: int
    canary: int

    def pack(self) -> bytes:
        return struct.pack(_FMT, PMP_MAGIC, self.physaddr, self.size,
                           self.canary)


def parse(buf: bytes) -> PmpDescriptor:
    magic, phys, size, canary = struct.unpack(_FMT, buf[:DESC_SIZE])
    if magic != PMP_MAGIC:
        raise ValueError(f"bad PMP magic {magic:#x}")
    return PmpDescriptor(phys, size, canary)


def map_buffer(desc: PmpDescriptor, devmem: str = "/dev/mem"):
    """mmap the physical buffer referenced by a descriptor and check the
    canary word at its end (leanmlmrx.cc:362-372)."""
    fd = os.open(devmem, os.O_RDONLY)
    try:
        page = mmap.PAGESIZE
        base = desc.physaddr & ~(page - 1)
        off = desc.physaddr - base
        m = mmap.mmap(fd, desc.size + off + 4, mmap.MAP_SHARED,
                      mmap.PROT_READ, offset=base)
    finally:
        os.close(fd)
    canary = struct.unpack_from("<I", m, off + desc.size)[0]
    if canary != desc.canary:
        raise ValueError("PMP canary mismatch — buffer overwritten")
    return memoryview(m)[off:off + desc.size]
