"""Tar-shard / WebDataset ingestion: member walk, sample grouping,
media handoff into the real pixel decoders."""

import io
import tarfile

import numpy as np
import pytest


def _make_tar(entries, compress=False):
    buf = io.BytesIO()
    mode = "w:gz" if compress else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.fixture()
def shard_dir(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_bmp, _make_png

    rng = np.random.RandomState(61)
    img1 = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    img2 = rng.randint(0, 256, (6, 10, 3)).astype(np.uint8)
    shard0 = _make_tar([
        ("000001.png", _make_png(img1, 2)),
        ("000001.txt", b"a red square"),
        ("000001.json", b'{"src": "cam"}'),
        ("000002.bmp", _make_bmp(img2)),
        ("000002.txt", b"a blue sky"),
        ("README", b"not a sample member"),  # no ext -> own key
    ])
    shard1 = _make_tar([
        ("sub/000003.png", _make_png(img1, 2)),
        ("sub/000003.seg.json", b'{"mask": []}'),  # multi-dot ext
        ("sub/000003.txt", b"nested dirs work"),
    ], compress=True)
    (tmp_path / "shard-000.tar").write_bytes(shard0)
    (tmp_path / "shard-001.tar.gz").write_bytes(shard1)
    (tmp_path / "broken.tar").write_bytes(b"\x00" * 100)
    return str(tmp_path), img1, img2


def test_read_tar_members(spark, shard_dir):
    from pipelinedb_spark.operators.archives import read_tar

    path, img1, img2 = shard_dir
    rows = read_tar(spark, path).collect()
    by_member = {r["member"]: r for r in rows}
    assert len(rows) == 9  # corrupt shard skipped, others complete
    assert by_member["000001.txt"]["key"] == "000001"
    assert by_member["000001.txt"]["ext"] == "txt"
    assert bytes(by_member["000001.txt"]["payload"]) == b"a red square"
    # multi-dot extension split at the FIRST dot of the basename
    seg = by_member["sub/000003.seg.json"]
    assert seg["key"] == "sub/000003" and seg["ext"] == "seg.json"
    assert by_member["README"]["ext"] == ""


def test_webdataset_samples_and_media_decode(spark, shard_dir):
    """Grouped samples flow into the dependency-free pixel decoders —
    the full tar-shard → image-statistics path with no codec libs."""
    from pipelinedb_spark.operators.archives import (read_tar,
                                                     webdataset_media,
                                                     webdataset_samples)
    from pipelinedb_spark.operators.multimodal import decode_pixels

    path, img1, img2 = shard_dir
    samples = webdataset_samples(read_tar(spark, path))
    rows = {r["key"]: r for r in samples.collect()}
    assert set(rows) == {"000001", "000002", "README", "sub/000003"}
    assert set(rows["000001"]["entries"]) == {"png", "txt", "json"}

    media = webdataset_media(samples)
    m = {r["key"]: r for r in media.collect()}
    assert set(m) == {"000001", "000002", "sub/000003"}  # README out
    assert m["000001"]["caption"] == "a red square"
    stats = decode_pixels(
        media.select("media_id", "kind", "payload"))
    by_id = {r["media_id"]: r for r in stats.collect()}
    mid1 = m["000001"]["media_id"]
    assert by_id[mid1]["format"] == "png"
    assert (by_id[mid1]["width"], by_id[mid1]["height"]) == (8, 8)
    assert by_id[mid1]["mean_r"] == pytest.approx(
        img1[..., 0].mean(), rel=1e-9)
    mid2 = m["000002"]["media_id"]
    assert by_id[mid2]["format"] == "bmp"
    assert by_id[mid2]["mean_b"] == pytest.approx(
        img2[..., 2].mean(), rel=1e-9)
    # stable ids across re-reads
    again = {r["key"]: r["media_id"] for r in
             webdataset_media(webdataset_samples(
                 read_tar(spark, path))).collect()}
    assert again == {k: r["media_id"] for k, r in m.items()}


def test_archive_corrupt_tolerance(spark, tmp_path):
    """Corrupt gzip WARC shards and mid-stream-truncated tars must
    not kill the batch: bad files skip, partial tars keep the
    members already read."""
    from pipelinedb_spark.operators.archives import read_tar
    from pipelinedb_spark.operators.warc import read_warc

    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b\x08garbage!!")
    assert read_warc(spark, str(tmp_path)).count() == 0

    good = _make_tar([("0001.txt", b"first"), ("0002.txt", b"second")])
    # cut inside the SECOND member's header block
    (tmp_path / "trunc.tar").write_bytes(good[:512 + 5 + 600])
    rows = read_tar(spark, str(tmp_path)).collect()
    assert [r["member"] for r in rows] == ["0001.txt"]
    assert bytes(rows[0]["payload"]) == b"first"


def test_read_zip_members_and_grouping(spark, tmp_path):
    """Zip shards parse to the same member schema as tar, so sample
    grouping and media handoff compose identically."""
    import zipfile

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_png

    from pipelinedb_spark.operators.archives import (read_zip,
                                                     webdataset_media,
                                                     webdataset_samples)
    from pipelinedb_spark.operators.multimodal import decode_pixels

    img = np.full((5, 5, 3), 33, dtype=np.uint8)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("0001.png", _make_png(img, 2))
        zf.writestr("0001.txt", b"zipped caption")
        zf.writestr("dir/", b"")  # directory entry skipped
    (tmp_path / "shard.zip").write_bytes(buf.getvalue())
    (tmp_path / "bad.zip").write_bytes(b"PK\x00\x00garbage")

    members = read_zip(spark, str(tmp_path))
    rows = {r["member"]: r for r in members.collect()}
    assert set(rows) == {"0001.png", "0001.txt"}
    assert bytes(rows["0001.txt"]["payload"]) == b"zipped caption"
    media = webdataset_media(webdataset_samples(members))
    r = media.collect()[0]
    assert r["caption"] == "zipped caption"
    stats = decode_pixels(
        media.select("media_id", "kind", "payload")).collect()[0]
    assert (stats["format"], stats["width"]) == ("png", 5)


def test_read_tar_payload_limit(spark, shard_dir):
    from pipelinedb_spark.operators.archives import read_tar

    path, _, _ = shard_dir
    rows = read_tar(spark, path, payload_limit=5).collect()
    t = [r for r in rows if r["member"] == "000001.txt"][0]
    assert bytes(t["payload"]) == b"a red"
    assert t["size"] == len(b"a red square")
    assert t["truncated"] is True


def test_duplicate_member_names_last_wins_no_crash(spark, tmp_path):
    """Tar legally allows duplicate member names (an appended member
    supersedes).  map_from_entries would throw 'Duplicate map key'
    and kill the whole ingestion job — the sample build must instead
    dedup per (key, ext) keeping the LAST archive occurrence."""
    from pipelinedb_spark.operators.archives import (read_tar,
                                                     webdataset_samples)

    shard = _make_tar([
        ("000001.txt", b"old caption"),
        ("000001.txt", b"new caption"),   # duplicate: supersedes
        ("000001.cls", b"7"),
    ])
    (tmp_path / "dup.tar").write_bytes(shard)
    members = read_tar(spark, str(tmp_path))
    assert members.count() == 3           # both duplicates surfaced
    samples = webdataset_samples(members).collect()
    assert len(samples) == 1
    ent = samples[0]["entries"]
    assert bytes(ent["txt"]) == b"new caption"
    assert bytes(ent["cls"]) == b"7"
