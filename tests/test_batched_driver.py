"""Batched device driver vs sequential pipeline (H19 demo, XLA engine)."""

import dataclasses
import os

import numpy as np

from conftest import ORACLE

from fasim_tpu.config import Params
from fasim_tpu.io import fasta
from fasim_tpu.kernels.xla import XlaScanEngine
from fasim_tpu.scan import batched, pipeline


def test_batched_scan_matches_sequential():
    p = Params(file1path=os.path.join(ORACLE, "testDNA.fa"),
               file2path=os.path.join(ORACLE, "H19.fa"))
    records, lnc, rna, seq_t = pipeline.scan_file(p)
    eng = XlaScanEngine(rna)
    # small batch size to exercise batching boundaries
    _, _, _, bat_t = batched.scan_file_batched(p, eng, batch_pairs=1)
    assert len(seq_t) == len(bat_t)
    for a, b in zip(seq_t, bat_t):
        assert dataclasses.astuple(a) == dataclasses.astuple(b)
