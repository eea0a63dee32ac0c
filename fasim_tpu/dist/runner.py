"""Multi-host distributed scan runner.

The reference is single-process (SURVEY.md §2.b); this is the framework's
own scaling design: every process (host) reads the same inputs, takes a
round-robin shard of the (record, segment) work list, scans it on its
local devices, and the hit lists are allgathered and merged in global
work order — so the merged result is bit-identical to a single-host run
regardless of process count or completion order.  Clustering and output
run on process 0 only (they are global over the RNA axis,
Fasim-LongTarget.cpp:812).

Collectives: two `process_allgather` rounds (hit-payload lengths, then
padded payloads) over jax.distributed — ICI within a slice, DCN across
hosts.  Hit payloads are tiny (triplex records, not colmax arrays), so
this gather is latency- not bandwidth-bound.

Checkpoint/resume (SURVEY.md §5): with `checkpoint_dir` set, each host
spills one pickle per finished work chunk; a restarted run reloads
finished chunks and rescans only the rest.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..config import Params
from ..io import fasta
from ..scan.batched import enumerate_work, finalize_records, scan_work
from ..scan.pipeline import Triplex


def _allgather_bytes(payload: bytes) -> list[bytes]:
    """Allgather one bytes object per process via two fixed-shape
    collectives (lengths, then padded uint8 payloads)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    n = jax.process_count()
    if n == 1:
        return [payload]
    buf = np.frombuffer(payload, np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        jnp.array([len(buf)], jnp.int64))).reshape(-1)
    maxlen = int(lens.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:len(buf)] = buf
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(padded)))
    gathered = gathered.reshape(n, maxlen)
    return [gathered[i, :lens[i]].tobytes() for i in range(n)]


def _checkpoint_path(ckpt_dir: str, pid: int, lo: int) -> str:
    return os.path.join(ckpt_dir, f"host{pid}-work{lo}.pkl")


def scan_distributed(p: Params, engine_factory, batch_pairs: int = 32,
                     host_threads: int = 0, checkpoint_dir: str | None = None,
                     checkpoint_every: int = 64):
    """Run the sharded scan.  Returns (records, lnc_name, rna, all_t) on
    process 0 and (records, lnc_name, rna, None) elsewhere.

    engine_factory(rna) builds the local scan engine (TpuScanEngine /
    XlaScanEngine) — constructed after the query is read.
    """
    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    records = fasta.read_dna(p.file1path)
    lnc_name, rna = fasta.read_rna(p.file2path)
    work, scans = enumerate_work(p, records)
    engine = engine_factory(rna)

    # contiguous chunks of the round-robin shard double as checkpoint units
    my_idx = list(range(pid, len(work), nproc))
    my_hits: dict[int, list[Triplex]] = {}
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    for lo in range(0, len(my_idx), checkpoint_every):
        chunk = my_idx[lo:lo + checkpoint_every]
        if checkpoint_dir:
            path = _checkpoint_path(checkpoint_dir, pid, lo)
            if os.path.exists(path):
                with open(path, "rb") as f:
                    my_hits.update(pickle.load(f))
                continue
        results = scan_work(p, rna, [work[i] for i in chunk], scans,
                            engine, batch_pairs, host_threads)
        found = {i: hits for i, (_, hits) in zip(chunk, results)}
        my_hits.update(found)
        if checkpoint_dir:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(found, f)
            os.replace(tmp, path)

    gathered = _allgather_bytes(pickle.dumps(my_hits))
    if pid != 0:
        return records, lnc_name, rna, None
    merged: dict[int, list[Triplex]] = {}
    for blob in gathered:
        merged.update(pickle.loads(blob))
    per_record: list[list[Triplex]] = [[] for _ in records]
    for i in sorted(merged):  # global (record, segment) order
        per_record[work[i].record_idx].extend(merged[i])
    return records, lnc_name, rna, finalize_records(p, records, per_record)


def main(argv=None) -> int:
    """Process entry: initialize jax.distributed from env/flags and run.

    Env: FASIM_COORD (host:port), FASIM_NPROC, FASIM_PID select loopback /
    cluster topology explicitly; absent, jax.distributed auto-detection
    applies (TPU pods).
    """
    import sys

    import jax

    from ..cli import make_engine, parse_args
    from ..post.output import print_result

    if os.environ.get("FASIM_CPU_PIN"):
        # scaling harness: pin each loopback worker to one core so the
        # XLA-CPU intra-op pool (sized to all cores) cannot thrash across
        # processes and the speedup measures framework overhead
        ncpu = os.cpu_count() or 1
        os.sched_setaffinity(
            0, {int(os.environ.get("FASIM_PID", "0")) % ncpu})
    p, tpu = parse_args(sys.argv[1:] if argv is None else argv)
    coord = os.environ.get("FASIM_COORD")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["FASIM_NPROC"]),
            process_id=int(os.environ["FASIM_PID"]))
    else:
        jax.distributed.initialize()
    host_threads = int(os.environ.get("FASIM_HOST_THREADS", "0"))
    reps = int(os.environ.get("FASIM_SCALING_REPS", "1"))
    engine_factory = lambda r: make_engine(tpu, r)  # noqa: E731
    for rep in range(reps):
        # scaling harness: repeat the scan so rep > 0 measures the warm
        # (compile-amortized) steady state; results are identical
        import time as _time

        t0 = _time.time()
        records, lnc_name, rna, all_t = scan_distributed(
            p, engine_factory, batch_pairs=tpu.segments_per_batch,
            host_threads=host_threads,
            checkpoint_dir=(os.environ.get("FASIM_CKPT") or None)
            if reps == 1 else None)
        if reps > 1 and jax.process_index() == 0:
            print(f"FASIM_SCAN_SECONDS rep={rep} {_time.time() - t0:.3f}",
                  flush=True)
    if jax.process_index() == 0:
        first = records[0]
        print_result(p, first.species, lnc_name, all_t, first.chro_tag,
                     len(first.seq), first.start_genome)
        print("finished normally")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
