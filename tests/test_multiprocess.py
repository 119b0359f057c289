"""Two-controller jax.distributed CPU test of the sharded kmerize program.

Spawns 2 subprocesses (4 fake devices each -> 8-way mesh) running
multiproc_worker.py, then byte-compares the combined shard outputs against the
golden reference — the closest single-box stand-in for a 2-host TPU run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.reference_impl import golden as G


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_kmerize_cli(tmp_path):
    """The 2-controller run expressed through the shipped CLI binary
    (VERDICT round 1 item 6): two processes x 4 fake CPU devices, round-robin
    input assignment, host 0 writes the container -- byte-equal to golden."""
    rng = np.random.default_rng(7)
    paths = []
    all_seqs = []
    for i in range(2):
        seqs = ["".join(rng.choice(list("ACGT"), size=90)) for _ in range(40)]
        p = tmp_path / f"in{i}.fastq"
        with open(p, "w") as f:
            for j, s in enumerate(seqs):
                f.write(f"@r{i}_{j}\n{s}\n+\n{'I' * len(s)}\n")
        paths.append(str(p))
        all_seqs.extend(seqs)

    port = _free_port()
    out = tmp_path / "out.zkf"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ZOTPU_PLATFORM"] = "cpu"   # wins over site-forced accelerator backends
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (extra + os.pathsep if extra else "") + repo
    procs = [subprocess.Popen(
        [sys.executable, "-m", "zotpu", "kmerize", "-k", "17",
         "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
         "--process-id", str(pid), "--batch-reads", "16", "--max-len", "96",
         str(out), *paths],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    from zotpu.io import container
    ks = container.read(str(out))
    # proc p consumed inputs[p::2]; golden over the union (order-free op)
    want_k, want_c = G.kmerize(17, all_seqs)
    assert np.array_equal(ks.keys, want_k)
    assert np.array_equal(ks.counts, want_c)


@pytest.mark.slow
def test_two_process_kmerize(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (extra + os.pathsep if extra else "") + repo
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    # Combine shard rows from both processes.
    D = 8
    rows = {}
    for pid in range(2):
        data = np.load(tmp_path / f"proc{pid}.npz")
        for key in data.files:
            name, d = key.rsplit("_", 1)
            rows.setdefault(int(d), {})[name] = data[key]
    assert sorted(rows) == list(range(D))
    keys_all, cnts_all = [], []
    for d in range(D):
        n = int(rows[d]["n"][0])
        assert int(rows[d]["ovf"][0]) == 0
        keys_all.append(S.join_hi_lo(rows[d]["uhi"][:n], rows[d]["ulo"][:n]))
        cnts_all.append(rows[d]["counts"][:n].astype(np.uint32))
    keys = np.concatenate(keys_all)
    cnts = np.concatenate(cnts_all)

    # Rebuild the identical global input and compare with golden.
    rng = np.random.default_rng(42)
    R, L, k = 32, 60, 17
    codes_g = rng.integers(0, 4, (R, L)).astype(np.uint8)
    seqs = [bytes(S.DECODE_LUT[row]).decode() for row in codes_g]
    want_k, want_c = G.kmerize(k, seqs)
    assert np.array_equal(keys, want_k)
    assert np.array_equal(cnts, want_c)


@pytest.mark.slow
def test_two_process_scan_cli(tmp_path):
    """Multi-host hash-sharded scan through the shipped CLI (VERDICT round 2
    item 3): 2 controllers x 4 fake CPU devices, samples assigned
    round-robin, panel sharded over the full 8-way mesh -- host 0's summary
    lines match the golden scan for BOTH samples."""
    import json

    from zotpu.io import container

    rng = np.random.default_rng(19)
    src = "".join(rng.choice(list("ACGT"), size=600))
    panel_keys, _ = G.kmerize(13, [src])
    panel = tmp_path / "panel.zkf"
    container.write(str(panel), container.KmerSet(
        k=13, keys=panel_keys, counts=None))

    paths, wants = [], []
    for i in range(2):
        seqs = []
        for j in range(30):
            if j % 3 == 0:
                off = rng.integers(0, len(src) - 80)
                seqs.append(src[off:off + 80])
            else:
                seqs.append("".join(rng.choice(list("ACGTN"), size=80)))
        p = tmp_path / f"s{i}.fastq"
        with open(p, "w") as f:
            for j, s in enumerate(seqs):
                f.write(f"@r{i}_{j}\n{s}\n+\n{'I' * len(s)}\n")
        paths.append(str(p))
        hits = G.scan_panel(13, panel_keys, seqs)
        wants.append((int(hits.sum()), int((hits > 0).sum())))

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ZOTPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (extra + os.pathsep if extra else "") + repo
    procs = [subprocess.Popen(
        [sys.executable, "-m", "zotpu", "scan",
         "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
         "--process-id", str(pid), "--shards", "8",
         "--batch-reads", "16", "--max-len", "96",
         str(panel), *paths],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    rows = [json.loads(l) for l in outs[0].splitlines()
            if l.startswith("{")]
    assert len(rows) == 2
    for row, path, (tot, rwh) in zip(rows, paths, wants):
        assert row["sample"] == path
        assert row["total_hits"] == tot, outs[0]
        assert row["reads_with_hits"] == rwh
    # host 1 prints no summaries (host 0 owns stdout for them)
    assert not [l for l in outs[1].splitlines() if l.startswith("{")]


@pytest.mark.slow
def test_two_process_spill_resume(tmp_path):
    """Multi-controller restartability (VERDICT round 2 item 5): per-host
    spills, crash after batch 1, resume reuses each host's completed runs,
    and a host losing one spill forces that batch to recompute everywhere
    -- final set byte-equal to golden each time."""
    rng = np.random.default_rng(31)
    all_seqs = []
    for i in range(2):
        seqs = ["".join(rng.choice(list("ACGT"), size=90)) for _ in range(40)]
        with open(tmp_path / f"in{i}.fastq", "w") as f:
            for j, s in enumerate(seqs):
                f.write(f"@r{i}_{j}\n{s}\n+\n{'I' * len(s)}\n")
        all_seqs.extend(seqs)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multiproc_spill_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (extra + os.pathsep if extra else "") + repo
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    want_k, want_c = G.kmerize(17, all_seqs)
    for pid in range(2):  # allgather: every host holds the global set
        data = np.load(tmp_path / f"spillres{pid}.npz")
        assert np.array_equal(data["keys"], want_k), outs[pid]
        assert np.array_equal(data["counts"], want_c)


@pytest.mark.slow
def test_two_process_stream_union_cli(tmp_path):
    """VERDICT round 4 item 4: multi-controller streamed sharded union --
    two processes x 4 fake CPU devices; each host feeds only its
    addressable shards from the shared filesystem; host 0 writes;
    byte-equal to the golden union."""
    rng = np.random.default_rng(11)
    k = 21
    a_keys = np.unique(rng.integers(0, 1 << (2 * k), 4000, dtype=np.uint64))
    b_keys = np.unique(np.concatenate([
        a_keys[::3], rng.integers(0, 1 << (2 * k), 3000, dtype=np.uint64)]))
    a_c = rng.integers(1, 60, len(a_keys)).astype(np.uint32)
    b_c = rng.integers(1, 60, len(b_keys)).astype(np.uint32)

    from zotpu.io import container
    pa, pb = str(tmp_path / "a.zkf"), str(tmp_path / "b.zkf")
    container.write(pa, container.KmerSet(k=k, keys=a_keys, counts=a_c))
    container.write(pb, container.KmerSet(k=k, keys=b_keys, counts=b_c))

    port = _free_port()
    out = tmp_path / "u.zkf"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ZOTPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (extra + os.pathsep if extra else "") + repo
    procs = [subprocess.Popen(
        [sys.executable, "-m", "zotpu", "union",
         "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
         "--process-id", str(pid), str(out), pa, pb],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    ks = container.read(str(out))
    want_k, want_c = G.union((a_keys, a_c), (b_keys, b_c))
    assert np.array_equal(ks.keys, want_k)
    assert np.array_equal(ks.counts, want_c)
