"""Device engines vs NumPy golden engine.

The XLA engine runs on the CPU backend here and shares its dataflow with
the Pallas TPU kernel (same recurrence, same padding/masking rules); the
Pallas kernel itself is verified bit-exact on real TPU hardware by
scripts/verify_tpu.py (Pallas interpret mode can wedge on the host
platform, so it is not exercised in CI).
"""

import numpy as np
import pytest

from fasim_tpu import rules
from fasim_tpu.kernels.batch_np import numpy_engine
from fasim_tpu.kernels.tpu import apply_byte_break
from fasim_tpu.kernels.xla import XlaScanEngine

BASES = np.frombuffer(b"ACGT", np.uint8)


def _random_seq(rng, n):
    return BASES[rng.integers(0, 4, n)]


@pytest.mark.parametrize("m,n", [(130, 256), (97, 300)])
def test_xla_engine_matches_numpy(m, n):
    rng = np.random.default_rng(7)
    rna = _random_seq(rng, m)
    seg = _random_seq(rng, n)
    scans = rules.scan_list(0, 0)[:8]
    s2l = [rules.make_scan_strings(seg, s)[0] for s in scans]
    thresh_np, colmax_np = numpy_engine(rna, s2l)
    eng = XlaScanEngine(rna)
    thresh_t, colmax_t = eng(rna, s2l)
    np.testing.assert_array_equal(thresh_np, thresh_t)
    np.testing.assert_array_equal(colmax_np, colmax_t)


def test_xla_engine_byte_break_regime():
    """Long poly-purine run drives scores past 251: the break column and
    zeroed tail must match the reference byte-kernel semantics."""
    rng = np.random.default_rng(3)
    rna = np.frombuffer(b"GA" * 100, np.uint8).copy()
    seg = np.concatenate([_random_seq(rng, 50),
                          np.frombuffer(b"GA" * 120, np.uint8),
                          _random_seq(rng, 60)])
    scans = [s for s in rules.scan_list(0, 0) if s["para"] == -1][:4]
    s2l = [rules.make_scan_strings(seg, s)[0] for s in scans]
    thresh_np, colmax_np = numpy_engine(rna, s2l)
    eng = XlaScanEngine(rna)
    thresh_t, colmax_t = eng(rna, s2l)
    np.testing.assert_array_equal(thresh_np, thresh_t)
    np.testing.assert_array_equal(colmax_np, colmax_t)


def test_xla_engine_ragged_padding():
    """Padded (shorter) segments inside a batch must not perturb results."""
    rng = np.random.default_rng(11)
    rna = _random_seq(rng, 64)
    segs = [_random_seq(rng, 200), _random_seq(rng, 140)]
    scans = rules.scan_list(0, 0)[:4]
    eng = XlaScanEngine(rna)
    # batch the two segments with right-padding using the pad code
    n = 200
    batch = []
    for seg in segs:
        s2l = [rules.make_scan_strings(seg, s)[0] for s in scans]
        codes = rules.SSW_ENC[np.stack(s2l)].astype(np.int32)
        pad = np.full((len(scans), n - codes.shape[1]),
                      rules.SSW_MAT.shape[0], np.int32)
        batch.append(np.concatenate([codes, pad], axis=1))
    out = eng.colmax_batch(np.stack(batch), "ssw")
    for k, seg in enumerate(segs):
        s2l = [rules.make_scan_strings(seg, s)[0] for s in scans]
        _, colmax_np = numpy_engine(rna, s2l)
        # numpy engine applies the byte break; compare post-op outputs
        got = apply_byte_break(out[k][:, :len(seg)])
        np.testing.assert_array_equal(colmax_np, got)


def test_apply_byte_break():
    cm = np.array([[1, 5, 251, 7, 300], [1, 2, 3, 4, 5]])
    out = apply_byte_break(cm)
    np.testing.assert_array_equal(out, [[1, 5, 0, 0, 0], [1, 2, 3, 4, 5]])
