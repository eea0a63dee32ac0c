"""Sharded scan step on the virtual 8-device CPU mesh.

Validates (SURVEY.md §4 "multi-host tests without a cluster"): the device
step under real (seg, rule, q) shardings computes the same thresholds and
column maxima as the scalar golden kernels, and its results are invariant
to the mesh shape.
"""

import numpy as np
import pytest

from fasim_tpu import dist, rules
from fasim_tpu.kernels import ref
from fasim_tpu.kernels.xla import XlaScanEngine

BASES = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    rna = BASES[rng.integers(0, 4, 96)]
    scans = rules.scan_list(0, 0)
    s, n = 8, 192
    codes_t = np.empty((s, len(scans), n), np.int32)
    codes_s = np.empty((s, len(scans), n), np.int32)
    for i in range(s):
        seg = BASES[rng.integers(0, 4, n)]
        s2l = np.stack([rules.make_scan_strings(seg, sc)[0] for sc in scans])
        codes_t[i] = rules.THRESH_ENC[s2l]
        codes_s[i] = rules.SSW_ENC[s2l]
    return rna, codes_t, codes_s


@pytest.mark.parametrize("shape", [(8, 1), (2, 4), (1, 8)])
def test_sharded_step_matches_golden_and_is_mesh_invariant(batch, shape):
    rna, codes_t, codes_s = batch
    eng = XlaScanEngine(rna)
    mesh = dist.make_mesh(*shape)
    step = dist.sharded_scan_step(mesh, eng.m16)
    thresh, colmax = step(codes_t, codes_s, eng.matq_thresh, eng.matq_ssw)
    thresh = np.asarray(thresh)
    colmax = np.asarray(colmax)
    # spot-check threshold and colmax of a few (segment, transform) pairs
    # against the scalar golden kernels
    for si, ti in [(0, 0), (1, 13), (7, 47)]:
        want_t = ref.sw_max(rules.THRESH_ENC[rna], codes_t[si, ti],
                            rules.THRESH_MAT)
        assert thresh[si, ti] == want_t
        want_cm = ref.sw_colmax(rules.SSW_ENC[rna], codes_s[si, ti],
                                rules.SSW_MAT)
        np.testing.assert_array_equal(colmax[si, ti], want_cm)
    # mesh-shape invariance vs the single-axis layout
    mesh1 = dist.make_mesh(8, 1)
    t1, c1 = dist.sharded_scan_step(mesh1, eng.m16)(
        codes_t, codes_s, eng.matq_thresh, eng.matq_ssw)
    np.testing.assert_array_equal(thresh, np.asarray(t1))
    np.testing.assert_array_equal(colmax, np.asarray(c1))


def test_shard_coverage_detection():
    """Failed-shard detection: holes in the merged work-index set raise,
    naming the owning process; full coverage passes silently."""
    from fasim_tpu.dist.runner import check_shard_coverage

    check_shard_coverage(10, range(10), 2)
    check_shard_coverage(0, [], 4)
    with pytest.raises(RuntimeError, match=r"2/10.*process\(es\) \[1\]"):
        check_shard_coverage(10, [0, 2, 3, 4, 6, 7, 8, 9], 2)
    with pytest.raises(RuntimeError, match="rerun with the same"):
        check_shard_coverage(5, [], 1)
