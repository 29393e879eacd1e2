import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms","cpu")
import numpy as np, subprocess, time
from leansdr_tpu.pipelines import tsgen, dvbs_tx
from leansdr_tpu.util.iofmt import write_iq
from leansdr_tpu.pipelines.dvbs_rx import DvbsReceiver, RxConfig
pkts = tsgen.generate(300)
iq = dvbs_tx.modulate(pkts, dvbs_tx.TxConfig(rate='1/2', interp=2))
rx = DvbsReceiver(RxConfig(Fs=4e6, Fm=2e6, rate='1/2', sampler='rrc', fastlock=True))
t0=time.time()
outs = []
for i in range(0, len(iq), 1<<16):
    outs.append(rx.process(iq[i:i+(1<<16)]))
out = np.concatenate(outs)
print('rrc rx', out.shape, 'time', time.time()-t0)
m = []
for o in out:
    hit = np.where((pkts == o).all(axis=1))[0]
    m.append(hit[0] if len(hit) else -1)
m = np.array(m)
print('matched', (m>=0).sum(), m[m>=0][:2], m[m>=0][-2:])
raw = write_iq(iq, 'f32')
r = subprocess.run(['.ref_build/src/apps/leandvb','--f32','-f','4e6','--sr','2e6','--cr','1/2','--anf','0','--fastlock','--sampler','rrc'], input=raw, capture_output=True)
ref_ts = np.frombuffer(r.stdout, dtype=np.uint8).reshape(-1,188)
print('ref', ref_ts.shape)
