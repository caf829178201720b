"""S3 adapter behind the condput seam (round-10 verdict
What's-missing #3 / task 3).

Three tiers:

* always-run unit tests of ``S3ObjectClient``'s translation layer —
  error mapping (412/409 → FileExistsError, NoSuchKey →
  FileNotFoundError), prefix stripping, direct-children-only listing,
  ListObjectsV2 pagination — against an in-memory botocore-shaped
  fake, so the adapter's own code paths run in this container even
  though boto3 isn't installed.
* always-run contract tests: ``CondPutManifestIO`` and a full
  ``IndexStore`` lifecycle (append / CAS conflict / manifest-history
  gc) with ``CLIENT_FACTORY`` routed through the ADAPTER over the
  fake service — one layer deeper than test_manifest_condput.py's
  four-primitive fake, which stays unchanged.
* a skip-gated e2e against a real S3-compatible endpoint (needs boto3
  + $SPARK_GRAFT_S3_TEST_URL, optional $SPARK_GRAFT_S3_ENDPOINT),
  the Kafka-test pattern: self-skips in this container.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

import pipelinedb_spark.manifestio as mio
from pipelinedb_spark.indexstore import CommitConflict, IndexStore
from pipelinedb_spark.manifestio import (CONDPUT_DIR, CondPutManifestIO,
                                         S3ObjectClient)


# ------------------------------------------------- botocore-shaped fake

class _AwsError(Exception):
    """Structurally identical to botocore.exceptions.ClientError for
    the fields the adapter reads (``.response``)."""

    def __init__(self, code, status):
        super().__init__(code)
        self.response = {"Error": {"Code": code},
                         "ResponseMetadata": {"HTTPStatusCode": status}}


class _Body:
    def __init__(self, data: bytes):
        self._d = data

    def read(self) -> bytes:
        return self._d


class _FakeS3Service:
    """One in-memory bucket namespace shared by every adapter client,
    conditional-put semantics included."""

    def __init__(self, page_size=2):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.mutex = threading.Lock()
        self.page_size = page_size  # tiny pages force pagination

    # --- boto3 s3 client surface the adapter uses
    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self.mutex:
            if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
                raise _AwsError("PreconditionFailed", 412)
            self.objects[(Bucket, Key)] = Body

    def get_object(self, Bucket, Key):
        with self.mutex:
            try:
                return {"Body": _Body(self.objects[(Bucket, Key)])}
            except KeyError:
                raise _AwsError("NoSuchKey", 404) from None

    def delete_object(self, Bucket, Key):
        with self.mutex:
            self.objects.pop((Bucket, Key), None)

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        with self.mutex:
            keys = sorted(k for (b, k) in self.objects
                          if b == Bucket and k.startswith(Prefix))
        start = int(ContinuationToken or 0)
        page = keys[start:start + self.page_size]
        out = {"Contents": [{"Key": k} for k in page],
               "IsTruncated": start + self.page_size < len(keys)}
        if out["IsTruncated"]:
            out["NextContinuationToken"] = str(start + self.page_size)
        return out


@pytest.fixture()
def svc():
    return _FakeS3Service()


def _client(svc, prefix="root/idx/_manifests"):
    return S3ObjectClient("bkt", prefix, client=svc)


# --------------------------------------------------------- unit tests

def test_put_if_absent_conflict_maps_to_fileexists(svc):
    c = _client(svc)
    c.put_if_absent("m1.json", "a")
    with pytest.raises(FileExistsError):
        c.put_if_absent("m1.json", "b")
    assert c.get("m1.json") == "a"  # loser never clobbers


def test_409_retried_until_it_settles(svc, monkeypatch):
    """409 ConditionalRequestConflict means a concurrent conditional
    PUT was in flight and NEITHER write is known to have landed
    (ADVICE round 11) — the adapter retries until the in-flight
    write settles.  Here it settles into success: we won."""
    monkeypatch.setattr(mio.time, "sleep", lambda s: None)
    c = _client(svc)
    real_put = svc.put_object
    calls = []

    def put_409_then_ok(**kw):
        calls.append(1)
        if len(calls) < 3:
            raise _AwsError("ConditionalRequestConflict", 409)
        return real_put(**kw)

    svc.put_object = put_409_then_ok
    c.put_if_absent("m1.json", "a")  # no error
    assert len(calls) == 3
    assert c.get("m1.json") == "a"


def test_409_settling_into_412_maps_to_fileexists(svc, monkeypatch):
    """...and here it settles into 412: the rival's object landed, so
    the retry sees the true exists condition and maps it."""
    monkeypatch.setattr(mio.time, "sleep", lambda s: None)
    c = _client(svc)
    calls = []

    def put_409_then_412(**kw):
        calls.append(1)
        if len(calls) < 2:
            raise _AwsError("ConditionalRequestConflict", 409)
        raise _AwsError("PreconditionFailed", 412)

    svc.put_object = put_409_then_412
    with pytest.raises(FileExistsError):
        c.put_if_absent("m1.json", "a")


def test_persistent_409_propagates_raw_not_fileexists(svc,
                                                      monkeypatch):
    """A 409 that outlives the retry budget must NOT claim 'object
    exists' — no object may exist, and FileExistsError would send
    MatrelStore's single-writer recovery down a head-compare that
    misreports the transient as a violated contract."""
    monkeypatch.setattr(mio.time, "sleep", lambda s: None)
    c = _client(svc)

    def put_409(**kw):
        raise _AwsError("ConditionalRequestConflict", 409)

    svc.put_object = put_409
    with pytest.raises(_AwsError):
        c.put_if_absent("m1.json", "a")


def test_get_missing_maps_to_filenotfound(svc):
    with pytest.raises(FileNotFoundError):
        _client(svc).get("nope.json")


def test_unexpected_errors_propagate_without_retry(svc):
    c = _client(svc)
    calls = []

    def put_403(**kw):
        calls.append(1)
        raise _AwsError("AccessDenied", 403)

    svc.put_object = put_403
    with pytest.raises(_AwsError):
        c.put_if_absent("m1.json", "a")
    assert len(calls) == 1  # non-transient → no retry


def test_transient_503_retried_to_success(svc, monkeypatch):
    """SlowDown throttling heals within the retry budget: the caller
    never sees the 503 and the object lands exactly once."""
    naps = []
    monkeypatch.setattr(mio.time, "sleep", naps.append)
    c = _client(svc)
    real_put, fails = svc.put_object, [0]

    def flaky_put(**kw):
        if fails[0] < 2:
            fails[0] += 1
            raise _AwsError("SlowDown", 503)
        return real_put(**kw)

    svc.put_object = flaky_put
    c.put_if_absent("m1.json", "a")
    assert c.get("m1.json") == "a"
    assert naps == [0.1, 0.2]  # linear backoff, one nap per failure


def test_persistent_500_raises_after_budget(svc, monkeypatch):
    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    c = _client(svc)
    calls = []

    def get_500(**kw):
        calls.append(1)
        raise _AwsError("InternalError", 500)

    svc.get_object = get_500
    with pytest.raises(_AwsError):
        c.get("m1.json")
    assert len(calls) == S3ObjectClient.RETRIES + 1


def test_412_after_ambiguous_retry_still_maps(svc, monkeypatch):
    """The documented CAS-safety story: a 503 whose PUT actually
    landed server-side makes the retry see 412 from our OWN object —
    the adapter must still surface FileExistsError (the caller then
    re-reads the head, same as any lost CAS)."""
    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    c = _client(svc)
    real_put, first = svc.put_object, [True]

    def ambiguous_put(**kw):
        if first[0]:
            first[0] = False
            real_put(**kw)  # write lands...
            raise _AwsError("SlowDown", 503)  # ...but reply is lost
        return real_put(**kw)

    svc.put_object = ambiguous_put
    with pytest.raises(FileExistsError):
        c.put_if_absent("m1.json", "a")
    assert c.get("m1.json") == "a"  # the data is there regardless


def test_list_strips_prefix_direct_children_only_paginated(svc):
    c = _client(svc)
    for i in range(7):  # > page_size → pagination exercised
        c.put_if_absent(f"m{i}.json", "x")
    # a nested key and a sibling prefix must not appear
    svc.put_object(Bucket="bkt", Key="root/idx/_manifests/sub/deep.json",
                   Body=b"y")
    svc.put_object(Bucket="bkt", Key="root/idx/other.json", Body=b"z")
    assert sorted(c.list()) == sorted(f"m{i}.json" for i in range(7))


def test_delete_swallows_and_from_url():
    svc = _FakeS3Service()
    c = S3ObjectClient.from_url("s3://bkt/root/idx/_manifests",
                                client=svc)
    c.delete("missing.json")  # no raise
    c.put_if_absent("a.json", "1")
    c.delete("a.json")
    with pytest.raises(FileNotFoundError):
        c.get("a.json")
    with pytest.raises(ValueError):
        S3ObjectClient.from_url("gs://bkt/x", client=svc)


def test_empty_prefix_is_bucket_root():
    svc = _FakeS3Service()
    c = S3ObjectClient("bkt", "", client=svc)
    c.put_if_absent("m1.json", "a")
    assert ("bkt", "m1.json") in svc.objects
    assert c.list() == ["m1.json"]


# ----------------------------------------------- condput contract

def test_condput_cas_and_gc_through_adapter(tmp_path, svc):
    root = str(tmp_path / "idx")
    io = CondPutManifestIO(root, client=_client(
        svc, os.path.join(root, CONDPUT_DIR)))
    assert not io.exists()
    io.write({"version": 1}, base_seq=0)
    m, seq = io.read_versioned()
    assert (m, seq) == ({"version": 1}, 1)
    with pytest.raises(mio.CommitConflict):
        io.write({"version": "rival"}, base_seq=0)  # CAS lost
    for i in range(2, 15):
        io.write({"version": i}, base_seq=i - 1)
    m, seq = io.read_versioned()
    assert m == {"version": 14} and seq == 14
    manifests = [bk for bk in svc.objects
                 if not bk[1].endswith("HEAD.json")]
    assert 0 < len(manifests) <= CondPutManifestIO.KEEP  # pruned
    # the advisory head hint rides the bucket too (r14) and is exact
    # here (single writer): one plain-PUT object, never gc'd
    heads = [bk for bk in svc.objects if bk[1].endswith("HEAD.json")]
    assert len(heads) == 1
    assert json.loads(svc.objects[heads[0]])["seq"] == 14
    assert not os.path.exists(os.path.join(root, CONDPUT_DIR))


def test_indexstore_lifecycle_through_adapter(tmp_path, svc,
                                              monkeypatch):
    """Full store semantics with every manifest byte riding the
    adapter: append, meta fold, replace-commit conflict, history gc —
    the test_objfake lifecycle one layer deeper."""
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=0.0,
                   manifest_format="condput")
    s.init_if_needed(meta={"cnt": 0})

    def add(content, replace=False, **kw):
        staged = s.stage()
        os.makedirs(staged)
        with open(os.path.join(staged, "f.txt"), "w") as f:
            f.write(content)
        return s.commit(staged, replace=replace, **kw)

    add("a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    snapshot = [os.path.basename(p) for p in s.dirs()]
    c = add("c", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    base = add("compacted", replace=True, expected_dirs=snapshot)
    assert [os.path.basename(p) for p in s.dirs()] == \
        [os.path.basename(base), os.path.basename(c)]
    assert s.meta()["cnt"] == 2
    with pytest.raises(CommitConflict):
        add("stale", replace=True, expected_dirs=snapshot,
            on_extra="conflict")
    for i in range(12):
        add(f"x{i}")
    manifests = [k for (_b, k) in svc.objects if "m0" in k]
    assert 0 < len(manifests) <= CondPutManifestIO.KEEP
    # no manifest bytes ever touched the local _manifests dir
    assert not os.path.exists(os.path.join(root, CONDPUT_DIR))


# ------------------------------------------------- gated real-S3 e2e

def _real_s3_available():
    if not os.environ.get("SPARK_GRAFT_S3_TEST_URL"):
        return False
    try:
        import boto3  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _real_s3_available(),
    reason="needs boto3 + $SPARK_GRAFT_S3_TEST_URL "
           "(s3://bucket/prefix; optional $SPARK_GRAFT_S3_ENDPOINT)")
def test_real_s3_commit_conflict_gc(tmp_path):
    url = os.environ["SPARK_GRAFT_S3_TEST_URL"].rstrip("/")
    endpoint = os.environ.get("SPARK_GRAFT_S3_ENDPOINT") or None
    c = S3ObjectClient.from_url(url + "/pdbtest_manifests",
                                endpoint_url=endpoint)
    try:
        root = str(tmp_path / "idx")
        io = CondPutManifestIO(root, client=c)
        io.write({"version": 1}, base_seq=0)
        assert io.read_versioned() == ({"version": 1}, 1)
        with pytest.raises(mio.CommitConflict):
            io.write({"version": "rival"}, base_seq=0)
        for i in range(2, 12):
            io.write({"version": i}, base_seq=i - 1)
        assert io.read_versioned()[1] == 11
        manifests = [n for n in c.list() if n != "HEAD.json"]
        assert len(manifests) <= CondPutManifestIO.KEEP
        assert json.loads(c.get("HEAD.json"))["seq"] == 11
    finally:
        for name in c.list():
            c.delete(name)


def test_concurrent_appends_with_injected_503s(tmp_path, monkeypatch):
    """Retry × CAS composition under contention: 6 threads append
    through the adapter while every service call randomly throws
    SlowDown.  Every append must land exactly once (the CAS dedups
    ambiguous retried PUTs; the retry heals the throttling) and the
    final manifest must reference every committed dir."""
    import random

    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    svc = _FakeS3Service()
    rnd = random.Random(20260816)

    def flaky(fn):
        def wrapped(**kw):
            if rnd.random() < 0.25:
                raise _AwsError("SlowDown", 503)
            return fn(**kw)
        return wrapped

    for meth in ("put_object", "get_object", "list_objects_v2"):
        setattr(svc, meth, flaky(getattr(svc, meth)))

    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="condput")
    s.init_if_needed(meta={"n": 0})

    def appender(tid, out):
        st = IndexStore(root, gc_grace_seconds=60.0,
                        manifest_format="condput")
        for i in range(4):
            staged = st.stage()
            os.makedirs(staged)
            with open(os.path.join(staged, "f.txt"), "w") as f:
                f.write(f"{tid}-{i}")
            out.append(st.commit(
                staged, replace=False, max_retries=50,
                meta_fn=lambda m: {**m, "n": m["n"] + 1}))

    done: list[str] = []
    threads = [threading.Thread(target=appender, args=(t, done))
               for t in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert len(done) == 24
    m = s.read_manifest()
    assert m["meta"]["n"] == 24           # no fold lost or doubled
    assert sorted(m["dirs"]) == sorted(os.path.basename(p)
                                       for p in done)
    contents = set()
    for d in m["dirs"]:
        with open(os.path.join(root, d, "f.txt")) as f:
            contents.add(f.read())
    assert len(contents) == 24            # every append exactly once


def test_commit_survives_ambiguous_put_success(tmp_path, svc,
                                               monkeypatch):
    """THE ambiguous-success resolution end-to-end (round-11 review):
    the manifest PUT lands server-side but replies 503; the adapter's
    retry sees 412 from our OWN object → CommitConflict.  The store
    must recognize its write in the re-read head and return success —
    a blind retry would rename the already-live committed dir
    (dangling the published dirs entry) and double-fold the meta."""
    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    real_put = svc.put_object
    state = {"armed": False, "fired": False}

    def ambiguous_put(**kw):
        if state["armed"] and not state["fired"] \
                and kw["Key"].endswith("m" + "2".zfill(20) + ".json"):
            state["fired"] = True
            real_put(**kw)                    # the write LANDS...
            raise _AwsError("SlowDown", 503)  # ...the reply is lost
        return real_put(**kw)

    svc.put_object = ambiguous_put
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=0.0,
                   manifest_format="condput")
    s.init_if_needed(meta={"n": 0})

    def add(content):
        staged = s.stage()
        os.makedirs(staged)
        with open(os.path.join(staged, "f.txt"), "w") as f:
            f.write(content)
        return s.commit(staged, replace=False,
                        meta_fn=lambda m: {**m, "n": m["n"] + 1})

    state["armed"] = True
    d1 = add("a")                      # the ambiguous commit
    state["armed"] = False
    assert state["fired"]
    m = s.read_manifest()
    assert m["meta"]["n"] == 1         # folded exactly once
    assert m["dirs"] == [os.path.basename(d1)]
    assert os.path.isdir(d1)           # never renamed away
    d2 = add("b")                      # store still fully functional
    assert s.read_manifest()["dirs"] == [os.path.basename(d1),
                                         os.path.basename(d2)]


def test_pin_survives_ambiguous_put_success(tmp_path, svc,
                                            monkeypatch):
    """Same resolution for the pins path: an ambiguous pin write must
    not surface FileExistsError from its own landed record."""
    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=0.0,
                   manifest_format="condput")
    s.init_if_needed(meta={})
    staged = s.stage()
    os.makedirs(staged)
    with open(os.path.join(staged, "f.txt"), "w") as f:
        f.write("x")
    s.commit(staged, replace=False)

    real_put, fired = svc.put_object, [False]

    def ambiguous_put(**kw):
        if not fired[0] and kw.get("IfNoneMatch") == "*":
            fired[0] = True
            real_put(**kw)
            raise _AwsError("SlowDown", 503)
        return real_put(**kw)

    svc.put_object = ambiguous_put
    s.pin("run")                       # must NOT raise FileExistsError
    assert fired[0]
    assert "run" in s.pins()


def test_matrel_condput_ambiguous_put_single_apply(tmp_path, svc,
                                                   monkeypatch,
                                                   spark):
    """Matrel manifests ride the same adapter: an ambiguous manifest
    PUT on a merge commit must resolve as success (single-writer:
    the head can only be our own write), not propagate
    CommitConflict — which would make the engine retry the merge and
    double-apply the batch."""
    from pyspark.sql import functions as F

    from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore

    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4,
                        manifest_format="condput")
    store.gc_grace_seconds = 0.0

    def merge_fn(df):
        return df.groupBy("k", BUCKET_COL).agg(F.sum("n").alias("n"))

    def merge(rows):
        store.merge(spark.createDataFrame(rows, "k string, n long"),
                    ["k"], merge_fn)

    merge([("a", 1)])
    real_put, armed = svc.put_object, [True]

    def ambiguous_put(**kw):
        if armed[0] and kw.get("IfNoneMatch") == "*" \
                and "/_manifests/" in kw["Key"]:
            armed[0] = False
            real_put(**kw)
            raise _AwsError("SlowDown", 503)
        return real_put(**kw)

    svc.put_object = ambiguous_put
    merge([("a", 10), ("b", 5)])       # the ambiguous commit
    assert not armed[0]
    got = {r["k"]: r["n"] for r in store.read().collect()}
    assert got == {"a": 11, "b": 5}    # applied exactly once


def test_concurrent_appends_with_ambiguous_successes(tmp_path,
                                                     monkeypatch):
    """The storm again, but 20% of conditional PUTs APPLY and then
    reply 503 (the ambiguous-success shape, not just clean throttling)
    — every committer must resolve its own landed write via the head
    re-read + applied() probe and never double-fold or lose a dir."""
    import random

    monkeypatch.setattr(mio.time, "sleep", lambda _s: None)
    svc = _FakeS3Service()
    rnd = random.Random(20260817)
    rlock = threading.Lock()
    real_put = svc.put_object

    def ambiguous_put(**kw):
        with rlock:
            roll = rnd.random()
        if roll < 0.2:
            real_put(**kw)                    # lands...
            raise _AwsError("SlowDown", 503)  # ...reply lost
        if roll < 0.3:
            raise _AwsError("SlowDown", 503)  # clean throttle
        return real_put(**kw)

    svc.put_object = ambiguous_put
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d), client=svc))
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="condput")
    s.init_if_needed(meta={"n": 0})

    def appender(tid, out):
        st = IndexStore(root, gc_grace_seconds=60.0,
                        manifest_format="condput")
        for i in range(4):
            staged = st.stage()
            os.makedirs(staged)
            with open(os.path.join(staged, "f.txt"), "w") as f:
                f.write(f"{tid}-{i}")
            out.append(st.commit(
                staged, replace=False, max_retries=50,
                meta_fn=lambda m: {**m, "n": m["n"] + 1}))

    done: list[str] = []
    threads = [threading.Thread(target=appender, args=(t, done))
               for t in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert len(done) == 24
    m = s.read_manifest()
    assert m["meta"]["n"] == 24            # no double-fold
    assert sorted(m["dirs"]) == sorted(os.path.basename(p)
                                       for p in done)
    for d in m["dirs"]:
        assert os.path.isdir(os.path.join(root, d))  # never renamed
