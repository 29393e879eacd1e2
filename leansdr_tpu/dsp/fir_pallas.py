"""Streaming FIR as a Pallas kernel (the RRC-FIR speed-of-light path).

XLA's shifted-add formulation of a long FIR materializes one pass per
tap; this kernel keeps the block plus its (ntaps-1)-sample halo in VMEM
and accumulates all taps in registers — one HBM read and one write per
sample, i.e. bandwidth-bound at speed of light.

Layout: rows (channels x re/im planes) on sublanes, time on lanes.
x [R, n] float32 with R a multiple of 8; output y[r, t] =
sum_k taps[k] * x[r, t - k] (causal; zeros before the stream head).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBLK = 2048
RBLK = 8


def _fir_kernel(taps, nt, x_ref, xh_ref, out_ref):
    """One grid step: block [RBLK, TBLK] with halo from the previous
    time block. x_ref: current block; xh_ref: previous block."""
    i = pl.program_id(1)
    halo = xh_ref[:, TBLK - (nt - 1):]
    halo = jnp.where(i == 0, jnp.zeros_like(halo), halo)
    ext = jnp.concatenate([halo, x_ref[...]], axis=1)   # [R, nt-1+TBLK]
    acc = jnp.zeros_like(out_ref)
    for k in range(nt):
        acc = acc + jnp.float32(taps[k]) * ext[:, nt - 1 - k: nt - 1 - k + TBLK]
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("taps", "interpret"))
def fir_pallas(x: jnp.ndarray, taps: tuple,
               interpret: bool = False) -> jnp.ndarray:
    """Causal FIR over the last axis. x [R, n], n divisible by TBLK."""
    R, n = x.shape
    nt = len(taps)
    assert n % TBLK == 0 and nt <= TBLK and R % RBLK == 0
    grid = (R // RBLK, n // TBLK)
    blk = pl.BlockSpec((RBLK, TBLK), lambda r, i: (r, i),
                       memory_space=pltpu.VMEM)
    # Previous time block: index max(i-1, 0); masked to zero for i == 0.
    hblk = pl.BlockSpec((RBLK, TBLK),
                        lambda r, i: (r, jnp.maximum(i - 1, 0)),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fir_kernel, taps, nt),
        grid=grid,
        in_specs=[blk, hblk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((R, n), jnp.float32),
        interpret=interpret,
    )(x, x)
