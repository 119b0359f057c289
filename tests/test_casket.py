"""Casket (named-member) containers: format round-trip + CLI + addressing.

Reference analog: the casket named-blob container layer (SURVEY.md section
2a "container format"); members here are complete ZKF streams and every
reading surface accepts 'casket.zkc#member'.
"""

import json

import numpy as np
import pytest

from zotpu import cli
from zotpu.io import container as C


def _ks(rng, k=25, n=1000, counts=True, seed_shift=0):
    keys = np.unique(rng.integers(1, 1 << (2 * k), n).astype(np.uint64))
    c = (rng.integers(1, 1000, len(keys)).astype(np.uint32)
         if counts else None)
    return C.KmerSet(k=k, keys=np.sort(keys), counts=c,
                     meta={"tag": seed_shift})


def run_cli(*argv):
    return cli.main([str(a) for a in argv])


@pytest.mark.parametrize("codec", ["raw", "zlib", "delta"])
def test_casket_roundtrip(tmp_path, rng, codec):
    a, b = _ks(rng, seed_shift=1), _ks(rng, counts=False, seed_shift=2)
    path = str(tmp_path / "c.zkc")
    C.casket_write(path, [("sampleA", a), ("bare", b)], codec=codec,
                   meta={"note": "x"})
    toc = C.casket_toc(path)
    assert [m["name"] for m in toc["members"]] == ["sampleA", "bare"]
    assert toc["meta"] == {"note": "x"}
    ra = C.casket_read(path, "sampleA")
    rb = C.read(path + "#bare")               # '#' addressing
    assert np.array_equal(ra.keys, a.keys)
    assert np.array_equal(ra.counts, a.counts)
    assert ra.meta == a.meta
    assert np.array_equal(rb.keys, b.keys)
    assert rb.counts is None


def test_casket_add_replace_and_headers(tmp_path, rng):
    path = str(tmp_path / "c.zkc")
    a = _ks(rng, seed_shift=1)
    C.casket_add(path, "a", a)                # creates the casket
    C.casket_add(path, "b", _ks(rng, seed_shift=2))
    a2 = _ks(rng, seed_shift=3)
    C.casket_add(path, "a", a2, codec="delta")  # replace keeps order: b, a
    toc = C.casket_toc(path)
    assert [m["name"] for m in toc["members"]] == ["b", "a"]
    got = C.read(path + "#a")
    assert np.array_equal(got.keys, a2.keys)
    # member header via the unified read_header
    hdr = C.read_header(path + "#a")
    assert hdr["codec"] == "delta" and hdr["n"] == a2.n
    # bare casket header is the TOC summary
    hdr = C.read_header(path)
    assert hdr["casket"] is True and len(hdr["members"]) == 2


def test_casket_errors(tmp_path, rng):
    path = str(tmp_path / "c.zkc")
    C.casket_write(path, [("a", _ks(rng))])
    with pytest.raises(ValueError, match="no member"):
        C.casket_read(path, "missing")
    with pytest.raises(ValueError, match="is a casket"):
        C.read(path)                          # bare casket as a set path
    with pytest.raises(ValueError, match="duplicate"):
        C.casket_write(path, [("a", _ks(rng)), ("a", _ks(rng))])
    zkf = str(tmp_path / "x.zkf")
    C.write(zkf, _ks(rng))
    with pytest.raises(ValueError, match="not a ZKC"):
        C.casket_toc(zkf)


def test_casket_cli_flow(tmp_path, rng, capsys):
    a, b = _ks(rng, seed_shift=1), _ks(rng, seed_shift=2)
    fa, fb = str(tmp_path / "a.zkf"), str(tmp_path / "b.zkf")
    C.write(fa, a)
    C.write(fb, b)
    ck = str(tmp_path / "c.zkc")
    assert run_cli("casket", "new", ck, f"a={fa}", f"b={fb}") == 0
    assert run_cli("casket", "ls", ck) == 0
    out = capsys.readouterr().out.strip().splitlines()
    toc = json.loads(out[-1])
    assert [m["name"] for m in toc["members"]] == ["a", "b"]
    # info on a member and on the bare casket
    assert run_cli("info", ck + "#b") == 0
    hdr = json.loads(capsys.readouterr().out.strip())
    assert hdr["n"] == b.n
    assert run_cli("info", ck) == 0
    assert json.loads(capsys.readouterr().out.strip())["casket"] is True
    # a set-op straight on casket members
    outf = str(tmp_path / "u.zkf")
    assert run_cli("union", "--host", outf, ck + "#a", ck + "#b") == 0
    got = C.read(outf)
    assert np.array_equal(got.keys, np.union1d(a.keys, b.keys))
    # extract a member back out and verify equality via the CLI
    ex = str(tmp_path / "a_out.zkf")
    assert run_cli("casket", "extract", ck, "a", ex) == 0
    capsys.readouterr()
    assert run_cli("verify", ex, fa) == 0
    assert json.loads(capsys.readouterr().out.strip())["equal"] is True
    # add with replacement via CLI
    assert run_cli("casket", "add", ck, "a", fb) == 0
    got = C.read(ck + "#a")
    assert np.array_equal(got.keys, b.keys)
    # K-mismatch member specs fail cleanly
    f15 = str(tmp_path / "k15.zkf")
    C.write(f15, _ks(rng, k=15))
    assert run_cli("casket", "new", str(tmp_path / "m.zkc"),
                   f"a={fa}", f"x={f15}") == 1
