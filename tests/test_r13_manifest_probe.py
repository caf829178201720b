"""Condput head-seq probe reads (round 13): manifest reads GET-probe
forward from the last observed seq instead of LISTing the bucket on
every read — the r13 condput soak measured 10.9k LISTs vs 202 PUTs in
300 s, so at bucket scale the read path, not the commit path, was the
dominant request cost.  These tests pin the exactness contract:

* warm reads issue ZERO LISTs at a steady head;
* another instance's commits are picked up exactly (forward walk);
* falling ≥KEEP commits behind falls back to the LIST path;
* an ambiguous commit that skips its gc sweep (orphan below head)
  never yields a stale read — the prefix-sweep gc keeps the live seq
  set contiguous, which is what the probe's proof rides on.
"""

from __future__ import annotations

import pytest

from pipelinedb_spark.manifestio import (CommitConflict,
                                         CondPutManifestIO,
                                         LocalFSObjectClient)


class _CountingClient:
    def __init__(self, directory):
        self.inner = LocalFSObjectClient(directory)
        self.ops = {"list": 0, "get": 0, "put": 0, "delete": 0}

    def list(self):
        self.ops["list"] += 1
        return self.inner.list()

    def get(self, name):
        self.ops["get"] += 1
        return self.inner.get(name)

    def put_if_absent(self, name, data):
        self.ops["put"] += 1
        return self.inner.put_if_absent(name, data)

    def delete(self, name):
        self.ops["delete"] += 1
        return self.inner.delete(name)


def _io(tmp_path, name="s"):
    root = str(tmp_path / name)
    c = _CountingClient(root + "/_manifests")
    return CondPutManifestIO(root, client=c), c


def test_steady_head_reads_never_list(tmp_path):
    io, c = _io(tmp_path)
    io.write({"v": 1}, base_seq=0)
    io.read_versioned()
    c.ops["list"] = 0
    c.ops["get"] = 0
    for _ in range(10):
        m, seq = io.read_versioned()
        assert m == {"v": 1} and seq == 1
    assert c.ops["list"] == 0
    # per read: one 404 probe + one head re-get
    assert c.ops["get"] == 20


def test_probe_sees_other_writers_commits(tmp_path):
    io1, c1 = _io(tmp_path)
    io1.write({"v": 1}, base_seq=0)
    io1.read_versioned()
    io2 = CondPutManifestIO(io1.root,
                            client=LocalFSObjectClient(io1.dir))
    _, seq = io2.read_versioned()
    for k in range(3):
        io2.write({"v": 2 + k}, base_seq=seq + k)
    c1.ops["list"] = 0
    m, seq1 = io1.read_versioned()
    assert (m, seq1) == ({"v": 4}, 4)
    assert c1.ops["list"] == 0          # pure forward walk


def test_fallen_behind_gc_window_uses_head_hint_then_relists(tmp_path):
    """A reader whose anchor was pruned re-syncs via the HEAD.json
    hint with ZERO lists (r14); with the hint gone, the original
    LIST fallback still holds."""
    io1, c1 = _io(tmp_path)
    io1.write({"v": 1}, base_seq=0)
    io1.read_versioned()
    io2 = CondPutManifestIO(io1.root,
                            client=LocalFSObjectClient(io1.dir))
    _, seq = io2.read_versioned()
    n = CondPutManifestIO.KEEP + 4
    for k in range(n):
        io2.write({"v": 2 + k}, base_seq=seq + k)
    c1.ops["list"] = 0
    m, seq1 = io1.read_versioned()
    assert m == {"v": 1 + n} and seq1 == 1 + n
    assert c1.ops["list"] == 0          # anchor pruned → hint rescued

    # hint deleted: the pre-r14 LIST fallback must still be there
    for k in range(n, 2 * n):
        io2.write({"v": 2 + k}, base_seq=seq + k)
    io2.client.delete(CondPutManifestIO.HEAD_HINT)
    c1.ops["list"] = 0
    m, seq1 = io1.read_versioned()
    assert m == {"v": 1 + 2 * n} and seq1 == 1 + 2 * n
    assert c1.ops["list"] >= 1          # no hint → LIST path


def test_orphan_from_skipped_gc_never_serves_stale_head(tmp_path):
    """An ambiguous landed-but-500 commit raises out of write() before
    gc, leaving its sweep skipped; later sweeps must still keep the
    live set contiguous so a probe anchored below the orphan cannot
    stop early on a hole."""
    io1, _ = _io(tmp_path)
    io1.write({"v": 1}, base_seq=0)
    io1.read_versioned()                # anchor at seq 1
    io2 = CondPutManifestIO(io1.root,
                            client=LocalFSObjectClient(io1.dir))
    _, seq = io2.read_versioned()
    # seq 2 lands WITHOUT a gc sweep (the ambiguous-commit shape)
    io2.client.put_if_absent("m%020d.json" % (seq + 1), '{"v": 2}')
    # many normal commits push the head far past the window
    io3 = CondPutManifestIO(io1.root,
                            client=LocalFSObjectClient(io1.dir))
    _, s3 = io3.read_versioned()
    for k in range(CondPutManifestIO.KEEP + 3):
        io3.write({"v": 3 + k}, base_seq=s3 + k)
    head_m, head_seq = io3.read_versioned()
    # the stale-anchored instance must agree with the true head
    m, seq1 = io1.read_versioned()
    assert (m, seq1) == (head_m, head_seq)


def test_cas_conflict_leaves_probe_consistent(tmp_path):
    io, _ = _io(tmp_path)
    io.write({"v": 1}, base_seq=0)
    _, seq = io.read_versioned()
    io.write({"v": 2}, base_seq=seq)
    with pytest.raises(CommitConflict):
        io.write({"v": 99}, base_seq=seq)
    m, s = io.read_versioned()
    assert (m, s) == ({"v": 2}, 2)


def test_probe_reads_linearize_under_random_schedules(tmp_path):
    """Property: under ANY single-threaded interleaving of commits
    (from multiple IO instances over one root, including ambiguous
    commits that skip their gc sweep) and reads (from instances with
    arbitrarily stale anchors), every read returns exactly the latest
    committed manifest."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 3),
                              st.sampled_from(["commit", "read",
                                               "orphan_commit"])),
                    min_size=1, max_size=40))
    def run(script):
        import shutil
        import tempfile
        root = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            ios = [CondPutManifestIO(
                root, client=LocalFSObjectClient(
                    root + "/_manifests")) for _ in range(4)]
            head = {"v": 0}
            head_seq = 0
            ios[0].write(head, base_seq=0)
            head_seq = 1
            for who, op in script:
                io = ios[who]
                if op == "read":
                    m, seq = io.read_versioned()
                    assert (m, seq) == (head, head_seq), \
                        f"stale read: got seq {seq}, head {head_seq}"
                elif op == "commit":
                    nxt = {"v": head["v"] + 1}
                    try:
                        io.write(nxt, base_seq=head_seq)
                        head, head_seq = nxt, head_seq + 1
                    except CommitConflict:
                        pass          # stale base: legal, no change
                else:  # ambiguous commit: lands, gc sweep skipped
                    nxt = {"v": head["v"] + 1}
                    try:
                        io.client.put_if_absent(
                            "m%020d.json" % (head_seq + 1),
                            __import__("json").dumps(nxt))
                        head, head_seq = nxt, head_seq + 1
                    except FileExistsError:
                        pass
            for io in ios:            # final convergence
                assert io.read_versioned() == (head, head_seq)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run()


def test_probe_walk_reverifies_anchor_after_the_404(tmp_path):
    """gc race (round-13 review): the probe walks to m2, then a rival
    bursts the head past the KEEP window (pruning m2) BEFORE the m3
    probe 404s.  Returning the already-fetched m2 body would serve a
    pruned manifest as the head — the walk must re-verify its anchor
    AFTER the 404 and fall back to LIST."""
    root = str(tmp_path / "race")
    plain = LocalFSObjectClient(root + "/_manifests")

    io_writer = CondPutManifestIO(root, client=plain)
    io_writer.write({"v": 1}, base_seq=0)

    class _RaceClient(LocalFSObjectClient):
        def __init__(self, directory, trigger, action):
            super().__init__(directory)
            self.trigger, self.action, self.fired = trigger, action, False

        def get(self, name):
            out = super().get(name)
            if not self.fired and name == self.trigger:
                self.fired = True
                self.action()
            return out

    def burst():
        _, seq = io_writer.read_versioned()
        for k in range(CondPutManifestIO.KEEP + 4):
            io_writer.write({"v": 100 + k}, base_seq=seq + k)

    reader = CondPutManifestIO(
        root, client=_RaceClient(root + "/_manifests",
                                 "m%020d.json" % 2, burst))
    reader.read_versioned()              # anchor at seq 1
    io_writer.write({"v": 2}, base_seq=1)  # head -> 2 (walk target)
    m, seq = reader.read_versioned()     # walk m2, burst fires, m3 404
    head = io_writer.read_versioned()
    assert (m, seq) == head, f"stale read {(m, seq)} vs head {head}"
    assert seq == 2 + CondPutManifestIO.KEEP + 4
