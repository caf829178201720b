"""Condput HEAD.json advisory head pointer (r13 verdict task 6).

The r13 probe protocol removed warm-reader LISTs, but cold readers
and readers that fall ≥KEEP commits behind still re-LISTed.  Each
commit now also plain-PUTs ``HEAD.json`` ({"seq": N}); readers GET it
once and probe from there.  The hint is NEVER trusted — the probe's
contiguous-suffix verification runs on top of it — so these tests pin
both the savings (zero LISTs on cold / fallen-behind reads) and the
safety (stale, corrupt, or missing hints demote to the LIST path and
still return the true head).
"""
from __future__ import annotations

import json

import pytest

from pipelinedb_spark.manifestio import (CondPutManifestIO,
                                         LocalFSObjectClient)


class _CountingPutClient:
    """Counting wrapper that ALSO forwards plain put (the r13 counting
    client predates the hint and deliberately lacks it)."""

    def __init__(self, directory):
        self.inner = LocalFSObjectClient(directory)
        self.ops = {"list": 0, "get": 0, "put": 0, "delete": 0,
                    "put_hint": 0}

    def list(self):
        self.ops["list"] += 1
        return self.inner.list()

    def get(self, name):
        self.ops["get"] += 1
        return self.inner.get(name)

    def put_if_absent(self, name, data):
        self.ops["put"] += 1
        return self.inner.put_if_absent(name, data)

    def put(self, name, data):
        self.ops["put_hint"] += 1
        return self.inner.put(name, data)

    def delete(self, name):
        self.ops["delete"] += 1
        return self.inner.delete(name)


def _io(tmp_path, name="s"):
    root = str(tmp_path / name)
    c = _CountingPutClient(root + "/_manifests")
    return CondPutManifestIO(root, client=c), c


def test_commit_writes_head_hint(tmp_path):
    io, c = _io(tmp_path)
    io.write({"v": 1}, base_seq=0)
    io.write({"v": 2}, base_seq=1)
    assert json.loads(c.inner.get("HEAD.json"))["seq"] == 2
    assert c.ops["put_hint"] == 2


def test_cold_reader_syncs_with_zero_lists(tmp_path):
    io, _ = _io(tmp_path)
    for k in range(5):
        io.write({"v": k}, base_seq=k)
    c = _CountingPutClient(io.dir)
    cold = CondPutManifestIO(io.root, client=c)
    m, seq = cold.read_versioned()
    assert (m, seq) == ({"v": 4}, 5)
    assert c.ops["list"] == 0
    # HEAD get + 404 probe + verified re-get of the head object
    assert c.ops["get"] == 3


def test_corrupt_hint_demotes_to_list_and_stays_correct(tmp_path):
    io, _ = _io(tmp_path)
    for k in range(3):
        io.write({"v": k}, base_seq=k)
    io.client.inner.put("HEAD.json", "{not json")
    c = _CountingPutClient(io.dir)
    cold = CondPutManifestIO(io.root, client=c)
    m, seq = cold.read_versioned()
    assert (m, seq) == ({"v": 2}, 3)
    assert c.ops["list"] >= 1


def test_stale_hint_still_reaches_true_head(tmp_path):
    """Last-writer-wins can leave HEAD pointing BELOW the live head
    (a slower committer overwrote a faster one's hint); the forward
    walk must still land on the true head without a LIST."""
    io, _ = _io(tmp_path)
    for k in range(6):
        io.write({"v": k}, base_seq=k)
    io.client.inner.put("HEAD.json", json.dumps({"seq": 3}))
    c = _CountingPutClient(io.dir)
    cold = CondPutManifestIO(io.root, client=c)
    m, seq = cold.read_versioned()
    assert (m, seq) == ({"v": 5}, 6)
    assert c.ops["list"] == 0


def test_hint_below_gc_window_demotes_to_list(tmp_path):
    io, _ = _io(tmp_path)
    n = CondPutManifestIO.KEEP + 6
    for k in range(n):
        io.write({"v": k}, base_seq=k)
    # hint points at a pruned seq whose successor is ALSO pruned
    io.client.inner.put("HEAD.json", json.dumps({"seq": 1}))
    c = _CountingPutClient(io.dir)
    cold = CondPutManifestIO(io.root, client=c)
    m, seq = cold.read_versioned()
    assert (m, seq) == ({"v": n - 1}, n)
    assert c.ops["list"] >= 1


def test_exists_via_hint_and_without(tmp_path):
    io, c = _io(tmp_path)
    assert not io.exists()
    io.write({"v": 1}, base_seq=0)
    fresh = CondPutManifestIO(io.root, client=_CountingPutClient(io.dir))
    assert fresh.exists()
    # hint gone: exists() falls back to the LIST of manifests
    io.client.inner.delete("HEAD.json")
    fresh2 = CondPutManifestIO(io.root,
                               client=_CountingPutClient(io.dir))
    assert fresh2.exists()


def test_exists_false_on_orphaned_hint_after_store_wipe(tmp_path):
    """r14 advice: HEAD.json is never gc'd, so an out-of-band removal
    of every m*.json (external prune, store wipe-and-recreate) leaves
    the hint as residue.  exists() must not trust it — a True here
    while read_versioned() raises would sticky-select condput format
    on a dead store."""
    io, c = _io(tmp_path)
    for n in range(3):
        io.write({"v": n}, base_seq=n)
    # out-of-band wipe of all manifests, hint left behind
    for name in list(io.client.inner.list()):
        if name != "HEAD.json":
            io.client.inner.delete(name)
    fresh = CondPutManifestIO(io.root, client=_CountingPutClient(io.dir))
    assert not fresh.exists()
    with pytest.raises(FileNotFoundError):
        fresh.read_versioned()
    # and a hint that is merely stale-behind (within the gc window)
    # still answers True off one GET of m{hint}
    io2, c2 = _io(tmp_path, "s2")
    io2.write({"v": 1}, base_seq=0)
    io2.write({"v": 2}, base_seq=1)
    io2.client.inner.put("HEAD.json", json.dumps({"seq": 1}))
    fresh2 = CondPutManifestIO(io2.root,
                               client=_CountingPutClient(io2.dir))
    assert fresh2.exists()
    assert fresh2.client.ops["list"] == 0     # hint verified by GET


def test_reads_linearize_under_hint_vandalism(tmp_path):
    """Property: random interleavings of commits, reads from
    arbitrarily stale instances, and HEAD.json vandalism (garbage,
    stale pointer, pointer past the live head) — every read still
    returns exactly the latest committed manifest.  The hint is an
    optimization hint ONLY; no corruption of it may surface a stale
    or wrong head."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipelinedb_spark.manifestio import CommitConflict

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(
        st.integers(0, 2),
        st.sampled_from(["commit", "read", "vandal_garbage",
                         "vandal_stale", "vandal_future"])),
        min_size=1, max_size=30))
    def run(script):
        root = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            ios = [CondPutManifestIO(
                root, client=LocalFSObjectClient(
                    root + "/_manifests")) for _ in range(3)]
            raw = LocalFSObjectClient(root + "/_manifests")
            head, head_seq = {"v": 0}, 0
            ios[0].write(head, base_seq=0)
            head_seq = 1
            for who, op in script:
                io = ios[who]
                if op == "read":
                    assert io.read_versioned() == (head, head_seq)
                elif op == "commit":
                    nxt = {"v": head["v"] + 1}
                    try:
                        io.write(nxt, base_seq=head_seq)
                        head, head_seq = nxt, head_seq + 1
                    except CommitConflict:
                        pass
                elif op == "vandal_garbage":
                    raw.put("HEAD.json", "{not json")
                elif op == "vandal_stale":
                    raw.put("HEAD.json", json.dumps({"seq": 1}))
                else:  # vandal_future
                    raw.put("HEAD.json",
                            json.dumps({"seq": head_seq + 10}))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run()


def test_clients_without_put_skip_the_hint(tmp_path):
    """The storage-contract fakes expose only the four commit-path
    primitives; a client with no plain put must still commit (the
    hint is optional everywhere)."""
    class FourPrimitive:
        def __init__(self, inner):
            self.inner = inner

        def list(self):
            return self.inner.list()

        def get(self, name):
            return self.inner.get(name)

        def put_if_absent(self, name, data):
            return self.inner.put_if_absent(name, data)

        def delete(self, name):
            return self.inner.delete(name)

    root = str(tmp_path / "s")
    io = CondPutManifestIO(
        root, client=FourPrimitive(LocalFSObjectClient(
            root + "/_manifests")))
    io.write({"v": 1}, base_seq=0)
    assert io.read_versioned() == ({"v": 1}, 1)
    with pytest.raises(FileNotFoundError):
        io.client.get("HEAD.json")
