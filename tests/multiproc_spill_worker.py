"""Worker for the 2-process spill/resume test (multi-controller
restartability, VERDICT round 2 item 5).

Phase 1: crash after batch 1 (fault injection). Phase 2: resume -- batch 1
must be REUSED from this host's spill (mtime unchanged), run completes.
Phase 3: host 0 deletes its batch-2 spill; resume must recompute batch 2 on
EVERY host (the unanimous-skip rule -- steps are collective) and still
produce the identical result.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils as mh

    from zotpu.workloads import kmerize as W

    paths = [os.path.join(outdir, f"in{pid}.fastq")]
    spill = os.path.join(outdir, "spill")
    os.makedirs(spill, exist_ok=True)
    k = 17
    kw = dict(batch_reads=16, max_len=96, spill_dir=spill)

    try:
        W.kmerize_paths_sharded(paths, k, 8, resume=False,
                                fail_after_batches=1, **kw)
        raise SystemExit("expected Interrupted")
    except W.Interrupted:
        pass
    run1 = os.path.join(spill, f"run000001.p{pid}.zkf")
    assert os.path.exists(run1), "batch-1 spill missing after crash"
    mt1 = os.path.getmtime(run1)

    keys, counts = W.kmerize_paths_sharded(paths, k, 8, resume=True, **kw)
    assert os.path.getmtime(run1) == mt1, "batch-1 spill was recomputed"
    np.savez(os.path.join(outdir, f"spillres{pid}.npz"),
             keys=keys, counts=counts)

    if pid == 0:
        os.remove(os.path.join(spill, "run000002.p0.zkf"))
    mh.sync_global_devices("rm-run2")
    k2, c2 = W.kmerize_paths_sharded(paths, k, 8, resume=True, **kw)
    assert np.array_equal(keys, k2), "post-delete resume diverged (keys)"
    assert np.array_equal(counts, c2), "post-delete resume diverged (counts)"
    # host 1's batch-2 spill was overwritten by the recompute, not reused
    print(f"proc{pid}: spill/resume ok", flush=True)


if __name__ == "__main__":
    main()
