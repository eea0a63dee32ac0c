"""Pure device rate of the window kernels (data resident, no transfers).

Times _wscan_call (v2) and _window_call (v1) on resident device arrays,
reporting cells/s with the bench_window accounting (rows x rlen x m).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from fasim_tpu.io import fasta
from fasim_tpu.kernels import tpu as ktpu

_, rna = fasta.read_rna(os.path.join(REPO, "oracle/MEG3.fa"))
m = len(rna)
rng = np.random.default_rng(0)
rows, rlen = 4096, 197

eng = ktpu.TpuScanEngine(rna)
eng.setup_windows(rna)

# v2: class 256
wcols, fwin = ktpu._WCLASSES[ktpu._WWIN]
R = eng._win_R[fwin]
G = rows // R
codes = rng.integers(0, 5, (G, R, 256)).astype(np.uint8)
codes[:, :, rlen:] = 4
rmeta = np.zeros((G, R, 128), np.int32)
rmeta[:, :, 1] = (m + 15) // 16 * 16
qrow = eng._qwin2[(False, fwin)]
cd = jax.device_put(codes)
md = jax.device_put(rmeta)


def run2():
    return np.asarray(ktpu._wscan_call(cd, md, qrow, m=m,
                      sstart=eng.win_sstart, fwin=fwin,
                      wcols=wcols)[0, 0, :1])


run2()
t0 = time.time()
for _ in range(5):
    run2()
dt2 = (time.time() - t0) / 5
print(f"v2 kernel: {dt2*1e3:.1f} ms/call, "
      f"{rows*rlen*m/dt2/1e9:.1f} GCUPS (counted), "
      f"{rows*wcols*m/dt2/1e9:.1f} GCUPS (padded)")

# v2: class 64 shape (the production majority)
wcols64, fwin64 = ktpu._WCLASSES[64]
R64 = eng._win_R[fwin64]
G64 = 4096 // R64
codes64 = rng.integers(0, 5, (G64, R64, 128)).astype(np.uint8)
codes64[:, :, 50:] = 4
rm64 = np.zeros((G64, R64, 128), np.int32)
rm64[:, :, 1] = (m + 15) // 16 * 16
q64 = eng._qwin2[(False, fwin64)]
c64 = jax.device_put(codes64)
m64 = jax.device_put(rm64)


def run64():
    return np.asarray(ktpu._wscan_call(c64, m64, q64, m=m, sstart=eng.win_sstart,
                            fwin=fwin64, wcols=wcols64)[0, 0, :1])


run64()
t0 = time.time()
for _ in range(5):
    run64()
dt64 = (time.time() - t0) / 5
print(f"v2 kernel (64-class): {dt64*1e3:.1f} ms/call, "
      f"{4096*50*m/dt64/1e9:.1f} GCUPS (counted@rlen50), "
      f"{4096*wcols64*m/dt64/1e9:.1f} GCUPS (padded)")

# v1 for comparison (same 4096x197 case)
os.environ["FASIM_WIN_V1"] = "1"
eng1 = ktpu.TpuScanEngine(rna)
eng1.setup_windows(rna)
del os.environ["FASIM_WIN_V1"]
R1 = 512
G1 = 8
codes1 = rng.integers(0, 5, (G1, R1, 256)).astype(np.uint8)
codes1[:, :, rlen:] = 4
rm1 = np.zeros((G1, R1, 128), np.int32)
rm1[:, :, 1] = (m + 15) // 16 * 16
c1 = jax.device_put(codes1)
md1 = jax.device_put(rm1)
qc1 = eng1.qwin_fwd


def run1():
    return np.asarray(ktpu._window_call(c1, md1, qc1, m=m)[0, 0, :1])


run1()
t0 = time.time()
for _ in range(5):
    run1()
dt1 = (time.time() - t0) / 5
print(f"v1 kernel: {dt1*1e3:.1f} ms/call, "
      f"{rows*rlen*m/dt1/1e9:.1f} GCUPS (counted)")
