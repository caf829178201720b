"""Round-9 regressions: the ADVICE r8 findings (row-less-batch append
crash, commit read-modify-write races, commit-lock TOCTOU, url_dedup
gating) and the new commit-seam semantics (``expected_dirs`` /
``meta_fn`` evaluated inside the commit critical section)."""

import glob
import os
import threading
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.indexstore import (CommitConflict, IndexStore,
                                         open_index, read_index)


def _vecs(spark, n, id0=0, dim=8, seed=3):
    rng = np.random.RandomState(seed + id0)
    return spark.createDataFrame(
        [(id0 + i, rng.randn(dim).tolist()) for i in range(n)],
        "vec_id long, embedding array<double>")


def _add(store, content, replace=False, **kw):
    staged = store.stage()
    os.makedirs(staged)
    with open(os.path.join(staged, "f.txt"), "w") as f:
        f.write(content)
    return store.commit(staged, replace=replace, **kw)


# ------------------------------------------------ row-less batch crash

def test_lsh_append_rowless_band_output_tags_not_crashes(
        spark, tmp_path, monkeypatch):
    """ADVICE r8 (high): a non-empty batch whose band rows come out
    EMPTY used to crash on the staged-dir readback — a partitionBy
    write of zero rows emits only _SUCCESS, and reading that back
    raises UNABLE_TO_INFER_SCHEMA, permanently failing the epoch on
    retry and leaking the staged dir.  The emptiness check now runs
    BEFORE staging.  (The signature kernel gives short/null texts a
    sentinel gram, so the row-less output is forced here by stubbing
    the band pass — the exact frame shape the append would stage.)"""
    from pipelinedb_spark.operators import dedup
    from pipelinedb_spark.operators.dedup import (lsh_index_append,
                                                  lsh_index_persist,
                                                  lsh_index_probe)

    path = str(tmp_path / "lsh")
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} " * 6) for i in range(6)],
        "doc_id long, text string")
    lsh_index_persist(corpus, path, num_hashes=16, bands=4)

    orig = dedup._banded_rows
    monkeypatch.setattr(
        dedup, "_banded_rows",
        lambda *a, **kw: orig(*a, **kw).filter(F.lit(False)))
    batch = spark.createDataFrame([(100, "whatever text")],
                                  "doc_id long, text string")
    assert lsh_index_append(spark, path, batch, txn=("s", 1)) is True
    st = open_index(path)
    assert len(st.dirs()) == 1          # no empty version dir
    assert st.txn_version("s") == 1     # epoch marked done
    assert not glob.glob(f"{path}/.stage-*")  # nothing leaked
    # replayed epoch still skips cleanly
    assert lsh_index_append(spark, path, batch, txn=("s", 1)) is False
    monkeypatch.undo()
    # index still probes
    probe = spark.createDataFrame(
        [(200, "alpha beta gamma delta 1 " * 6)],
        "doc_id long, text string")
    assert lsh_index_probe(spark, path, probe).count() > 0


def test_span_append_all_short_docs_no_stage_leak(spark, tmp_path):
    """Span twin of the row-less case: every doc shorter than the
    window K — tag-only, no staged dir left behind."""
    from pipelinedb_spark.operators.spandedup import (span_index_append,
                                                      span_index_persist)

    path = str(tmp_path / "span")
    words = " ".join(f"w{i}" for i in range(30))
    span_index_persist(spark.createDataFrame(
        [(1, words)], "doc_id long, text string"), path, window=5)
    tiny = spark.createDataFrame([(2, "too short"), (3, None)],
                                 "doc_id long, text string")
    assert span_index_append(spark, path, tiny, txn=("s", 7)) is True
    st = open_index(path)
    assert len(st.dirs()) == 1 and st.txn_version("s") == 7
    assert not glob.glob(f"{path}/.stage-*")


# ------------------------------------------------ commit lock TOCTOU

def test_stale_lock_broken_by_exactly_one_of_two_breakers(tmp_path):
    """Two committers find the same stale lock: rename-to-unique lets
    exactly one reap it; both eventually commit, never concurrently."""
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0)
    s.init_if_needed()
    lock = os.path.join(s.root, "_commit.lock")
    with open(lock, "w") as f:
        f.write("crashed-owner-token")
    old = time.time() - 10_000
    os.utime(lock, (old, old))

    mu = threading.Lock()
    state = {"conc": 0, "max": 0, "done": 0}
    errs = []

    def worker():
        try:
            with s._commit_lock(timeout=20):
                with mu:
                    state["conc"] += 1
                    state["max"] = max(state["max"], state["conc"])
                time.sleep(0.05)
                with mu:
                    state["conc"] -= 1
                    state["done"] += 1
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert state["done"] == 2
    assert state["max"] == 1            # never concurrent
    assert not os.path.exists(lock)     # released
    assert not glob.glob(f"{lock}.reap-*")


def test_fresh_lock_never_broken(tmp_path):
    s = IndexStore(str(tmp_path / "idx"))
    s.init_if_needed()
    lock = os.path.join(s.root, "_commit.lock")
    with open(lock, "w") as f:
        f.write("live-owner")
    with pytest.raises(TimeoutError):
        with s._commit_lock(timeout=0.3):
            pass
    with open(lock) as f:
        assert f.read() == "live-owner"  # untouched


def test_misjudged_break_restores_fresh_lock(tmp_path, monkeypatch):
    """THE TOCTOU corner (ADVICE r8 low): between the staleness stat
    and the reap, the crashed owner's lock is released and a FRESH
    committer acquires.  The breaker's token check detects the swap
    and restores the fresh lock instead of deleting it."""
    s = IndexStore(str(tmp_path / "idx"))
    s.init_if_needed()
    lock = os.path.join(s.root, "_commit.lock")
    with open(lock, "w") as f:
        f.write("A" * 32)

    calls = {"n": 0}
    orig_mtime = os.path.getmtime

    def fake_mtime(p):
        if os.path.abspath(str(p)) == os.path.abspath(lock):
            calls["n"] += 1
            if calls["n"] <= 2:
                # judged stale at the first look AND at the pre-reap
                # re-verify (r9): the swap this test simulates lands
                # in the microsecond window between re-verify and
                # rename, which only the post-reap token check (and
                # the commit-time ownership backstop) can catch
                return time.time() - 10_000
        return orig_mtime(p)

    monkeypatch.setattr(os.path, "getmtime", fake_mtime)
    orig_rename = os.rename

    def rename_hook(src, dst, **kw):
        # simulate release + fresh acquisition in the stat→rename
        # window: the content the breaker claims is NOT what it
        # observed
        if (os.path.abspath(str(src)) == os.path.abspath(lock)
                and ".reap-" in str(dst)):
            with open(lock, "w") as f:
                f.write("B" * 32)
        return orig_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", rename_hook)
    with pytest.raises(TimeoutError):
        with s._commit_lock(timeout=0.3):
            pass
    with open(lock) as f:
        assert f.read() == "B" * 32     # fresh lock restored, not reaped
    assert not glob.glob(f"{lock}.reap-*")


# ----------------------------------- replace-commit vs append races

def test_replace_commit_keeps_concurrently_appended_dirs(tmp_path):
    """Compaction semantics: a batch appended between the rewrite's
    snapshot read and its swap stays LIVE beside the new base (it was
    not folded into the staged output, so dropping it would be data
    loss — ADVICE r8 medium)."""
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0)
    s.init_if_needed()
    _add(s, "a")
    _add(s, "b")
    snapshot = [os.path.basename(p) for p in s.dirs()]
    c_path = _add(s, "c")               # "concurrent" append
    base = _add(s, "compacted", replace=True, expected_dirs=snapshot)
    live = [os.path.basename(p) for p in s.dirs()]
    assert live == [os.path.basename(base), os.path.basename(c_path)]
    assert s.base_dir() == base         # new base owns artifacts


def test_replace_commit_conflicts_for_retrain_semantics(tmp_path):
    """on_extra='conflict' (retrain): an extra dir means the staged
    rebuild is stale — raise, shelve the published dir back to stage
    naming, leave the live set untouched."""
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0)
    s.init_if_needed()
    _add(s, "a")
    snapshot = [os.path.basename(p) for p in s.dirs()]
    _add(s, "b")                        # concurrent append
    pre = [os.path.basename(p) for p in s.dirs()]
    with pytest.raises(CommitConflict):
        _add(s, "rebuild", replace=True, expected_dirs=snapshot,
             on_extra="conflict")
    assert [os.path.basename(p) for p in s.dirs()] == pre
    shelved = glob.glob(f"{s.root}/.stage-conflict-*")
    assert len(shelved) == 1            # reclaimable, not a fake v-dir
    s.gc(include_stage=True)
    assert not glob.glob(f"{s.root}/.stage-conflict-*")


def test_replace_commit_conflicts_on_missing_expected_dir(tmp_path):
    """A consumed dir no longer in the manifest = a concurrent replace
    won; the late rewrite must conflict, not resurrect stale data."""
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0)
    s.init_if_needed()
    _add(s, "a")
    snapshot = [os.path.basename(p) for p in s.dirs()]
    _add(s, "winner", replace=True)     # concurrent replace
    with pytest.raises(CommitConflict):
        _add(s, "loser", replace=True, expected_dirs=snapshot)


def test_meta_fn_folds_over_current_meta(tmp_path):
    """meta_fn runs inside the commit critical section on the CURRENT
    meta — accounting deltas compose across interleaved commits."""
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0)
    s.init_if_needed(meta={"cnt": 0})
    _add(s, "a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    s.tag(meta={"cnt": 100})            # interleaved absolute write
    _add(s, "b", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    assert s.meta()["cnt"] == 101
    with pytest.raises(ValueError):
        _add(s, "c", meta={"x": 1}, meta_fn=lambda m: m)


def test_bm25_append_accounting_exact_under_threads(spark, tmp_path):
    """End-to-end ADVICE r8 check: concurrent bm25_appends must not
    lose n_docs/total_dl accounting (it feeds every score).  Four
    threads append disjoint batches; the final accounting equals a
    from-scratch rebuild's."""
    from pipelinedb_spark.operators.retrieval import (bm25_index,
                                                      bm25_load,
                                                      bm25_append,
                                                      bm25_persist)

    path = str(tmp_path / "bm25")
    base = spark.createDataFrame(
        [(0, "base document zero"), (1, "base document one two")],
        "doc_id long, text string")
    bm25_persist(bm25_index(base), path)

    batches = [
        spark.createDataFrame(
            [(10 * b + i, f"batch {b} doc {i} " + "pad " * (b + i))
             for i in range(2)],
            "doc_id long, text string")
        for b in range(1, 5)]
    errs = []

    def worker(df):
        try:
            assert bm25_append(spark, path, df) == 2
        except Exception as e:          # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(b,)) for b in batches]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    idx = bm25_load(spark, path)
    assert idx["n_docs"] == 2 + 8
    # exact accounting: avgdl matches a from-scratch build over the
    # union of every batch
    full = base
    for b in batches:
        full = full.unionByName(b)
    ref = bm25_index(full)
    assert idx["avgdl"] == pytest.approx(ref["avgdl"], abs=1e-12)


def test_ivf_retrain_with_concurrent_append_retries_and_keeps_all(
        spark, tmp_path, monkeypatch):
    """A batch appended DURING a retrain (old-centroid assignments)
    used to be silently dropped and GC'd.  Now the pinned-snapshot
    commit conflicts and the retrain re-runs over the larger index —
    every vector survives, accounting resets."""
    from pipelinedb_spark.operators import similarity
    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist,
                                                       ivf_retrain,
                                                       ivf_staleness)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 40), path, n_lists=4)

    orig_train = similarity.ivf_train
    state = {"injected": False}

    def train_hook(corpus, *a, **kw):
        if not state["injected"]:
            state["injected"] = True
            # lands between the retrain's snapshot read and its swap
            assert ivf_append(spark, path,
                              _vecs(spark, 10, id0=1000)) == 10
        return orig_train(corpus, *a, **kw)

    monkeypatch.setattr(similarity, "ivf_train", train_hook)
    ivf_retrain(spark, path)
    rows = {r["vec_id"] for r in
            read_index(spark, path).select("vec_id").collect()}
    assert len(rows) == 50              # base 40 + concurrent 10
    assert ivf_staleness(path)["appended_n"] == 0  # accounting reset


# ------------------------------------------- kcenter (round-9 task 5)

def test_kcenter_checkpoint_storage_bounded(spark, monkeypatch):
    """Review r8: each pass's localCheckpoint used to be left to the
    GC (up to k live copies of (id, vec, dist) in executor storage).
    Now the previous checkpoint is released as soon as the next
    materializes: ≤2 alive mid-run, 0 extra after return."""
    from pipelinedb_spark.operators import similarity

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    seen = []
    orig = similarity._release_local_checkpoint

    def spy(df):
        seen.append(jsc.getPersistentRDDs().size())
        orig(df)

    monkeypatch.setattr(similarity, "_release_local_checkpoint", spy)
    rng = np.random.RandomState(0)
    df = spark.createDataFrame(
        [(i, rng.randn(6).tolist()) for i in range(40)],
        "vec_id long, embedding array<double>")
    out = similarity.kcenter_select(df, 6, seed=3)
    assert out.count() == 6
    assert len(seen) == 5               # k−2 pass releases + final
    assert max(seen) <= base + 2        # never more than 2 alive
    assert jsc.getPersistentRDDs().size() == base  # all freed


def test_kcenter_over_centroids_covers_clusters(spark):
    """The large-k composition (ivf_train pre-reduce → driver greedy
    over centroids → one vectorized nearest-exemplar pass): on
    well-separated clusters it selects one exemplar per cluster and
    its covering radius stays within the quantization-slackened
    2-approximation of the exact greedy."""
    from pipelinedb_spark.operators.similarity import (
        kcenter_numpy, kcenter_over_centroids)

    rng = np.random.RandomState(11)
    dim, per = 6, 40
    centers = np.eye(dim)[:4]           # 4 orthogonal directions
    pts, rows = [], []
    for c_i, c in enumerate(centers):
        for j in range(per):
            v = c + 0.03 * rng.randn(dim)
            pts.append(v)
            rows.append((c_i * per + j, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = kcenter_over_centroids(df, 4, n_centroids=12, sample=400,
                                 seed=3).collect()
    assert len(got) == len(rows)        # every point assigned
    assert {r["exemplar"] for r in got} == {0, 1, 2, 3}
    # each true cluster lands on ONE exemplar, tightly
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["vec_id"] // per,
                              set()).add(r["exemplar"])
    assert all(len(s) == 1 for s in by_cluster.values())
    r_comp = max(r["exemplar_dist"] for r in got)
    # exact-greedy covering radius (numpy oracle over all points)
    _, d = kcenter_numpy(np.array(pts), 4)
    r_exact = float(d.max())
    assert r_comp <= 2.0 * r_exact + 0.05  # 2-approx + quantization
    assert r_comp < 0.1                    # structured case: tight


def test_kcenter_over_centroids_fewer_distinct_than_k(spark):
    from pipelinedb_spark.operators.similarity import \
        kcenter_over_centroids

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)] +
        [(9 + i, [0.0, 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>")
    got = kcenter_over_centroids(df, 5, n_centroids=4, sample=64,
                                 seed=3).collect()
    assert len(got) == 6
    assert len({r["exemplar"] for r in got}) == 2  # only 2 directions


# --------------------------------- bm25_search_many broadcast gate

def test_bm25_search_many_broadcast_gate_same_scores(spark):
    """Round-9 task 3: the per-query term/idf table broadcasts only
    under the size gate; past it (decontamination-scale query sets)
    the join falls back to a pinned shuffle-hash — same scores, no
    broadcast-ceiling failure mode."""
    from pipelinedb_spark.operators.retrieval import (bm25_index,
                                                      bm25_search_many)

    docs = spark.createDataFrame(
        [(i, f"doc {i} spark engine words pad{i % 3}")
         for i in range(12)],
        "doc_id long, text string")
    idx = bm25_index(docs)
    queries = spark.createDataFrame(
        [(1, "spark engine"), (2, "pad0 words"), (3, "doc 3")],
        "query_id long, query string")

    small = bm25_search_many(idx, queries, k=5)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    large = bm25_search_many(idx, queries, k=5, broadcast_max_bytes=0)
    plan_large = large._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_large

    def rows(df):
        return sorted((r["query_id"], r["doc_id"], r["rank"],
                       round(r["score"], 9)) for r in df.collect())

    got_small, got_large = rows(small), rows(large)
    assert got_small == got_large       # scores identical across gate
    assert got_small                    # and non-trivial


# ------------------------------ stopword-free (CJK) extraction mode

_ZH_PARAS = [
    "委员会详细审查了这项提案，认为第二稿已经回应了大部分的反对意见，"
    "而且该稿件在会议召开之前就已经分发给了每一位成员，供大家提前审阅"
    "并提出修改建议。",
    "在就预算问题进行了长时间的讨论之后，成员们一致同意将新的拨款分摊"
    "到三年之内，这样就不会有任何一个部门需要在一年之内承担全部的费用"
    "压力，从而保证各项工作平稳推进。",
    "最终表决定于下周举行，主席要求所有尚未提出的意见务必在月底之前以"
    "书面形式提交，以便将其完整地记录在案，供后续的工作会议参考和查阅。",
]
_ZH_NAV = ('<div class="menu">' + " ".join(
    f'<a href="/{i}">栏目{i}</a>' for i in range(10)) + "</div>")
_ZH_PAGE = ("<html><head><title>会议纪要</title></head><body>"
            + _ZH_NAV
            + "<article><h1>委员会会议纪要</h1>"
            + "".join(f"<p>{p}</p>" for p in _ZH_PARAS)
            + "</article>" + _ZH_NAV
            + "<footer><p>版权所有 <a href='/tos'>服务条款</a> | "
            "<a href='/privacy'>隐私政策</a></p></footer>"
            "</body></html>").encode()

_KO_PARAS = [
    "위원회는 제안서를 자세히 검토한 결과 두 번째 초안에서 대부분의 "
    "반대 의견이 이미 반영되었다고 판단하였으며 해당 초안은 회의가 "
    "소집되기 전에 모든 위원에게 미리 배포되었다고 밝혔다.",
    "예산 문제에 대한 오랜 논의 끝에 위원들은 새로운 재원을 삼 년에 "
    "걸쳐 나누어 집행하기로 합의하였고 이렇게 하면 어느 부서도 한 해에 "
    "전체 비용을 부담하지 않아도 된다는 점에 모두 동의하였다.",
]
_KO_NAV = ('<div class="menu">' + " ".join(
    f'<a href="/{i}">메뉴{i}</a>' for i in range(10)) + "</div>")
_KO_PAGE = ("<html><body>" + _KO_NAV
            + "<article>"
            + "".join(f"<p>{p}</p>" for p in _KO_PARAS)
            + "</article>" + _KO_NAV + "</body></html>").encode()


def test_extraction_chinese_page_drops_boilerplate(spark):
    """Round-9 task 4: space-free scripts used to silently fall back
    to tag-strip (zero stopword density → no block ever 'good').
    Block-level space-free exemption keeps the article and still
    drops the link-list boilerplate."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    strip = html_to_text_py(_ZH_PAGE)
    assert "栏目3" in strip                  # baseline keeps nav
    dense = extract_main_text(_ZH_PAGE)
    assert dense != strip                    # NOT the fallback
    for p in _ZH_PARAS:
        assert p in dense
    assert "委员会会议纪要" in dense          # heading survives
    assert "栏目3" not in dense              # link-list nav gone
    assert "隐私政策" not in dense            # footer gone


def test_extraction_korean_page_uses_pagelevel_fallback(spark):
    """Korean spaces its eojeol but shares no stopwords with the
    Latin list — hangul blocks ride the per-block script exemption
    (review r9: was the page-level mode, which a single good Latin
    block would have disabled)."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    dense = extract_main_text(_KO_PAGE)
    assert dense != html_to_text_py(_KO_PAGE)
    for p in _KO_PARAS:
        assert p in dense
    assert "메뉴3" not in dense


def test_extraction_mixed_page_keeps_cjk_paragraph(spark):
    """A mostly-English page with one Chinese paragraph: the Latin
    path stays stopword-gated, and the CJK block rides the space-free
    exemption instead of being dropped."""
    from pipelinedb_spark.operators.warc import extract_main_text
    from tests.test_r8_fixes import _ARTICLE_PAGE, _PARAS

    page = _ARTICLE_PAGE.replace(
        b"</article>",
        f"<p>{_ZH_PARAS[0]}</p></article>".encode())
    dense = extract_main_text(page)
    for p in _PARAS:
        assert p in dense
    assert _ZH_PARAS[0] in dense
    assert "Pricing" not in dense            # nav still gone


def test_extraction_english_linkfarm_still_falls_back(spark):
    """All-boilerplate Latin pages keep the old behavior: the
    stopword-free mode never engages when function-word signal
    exists, and high link density stays bad in both modes — the page
    tag-strips rather than returning empty."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    page = ("<html><body>" + "".join(
        '<div>' + " ".join(f'<a href="/{i}-{j}">item of list {i} '
                           f'number {j}</a>' for j in range(8))
        + '</div>' for i in range(5)) + "</body></html>").encode()
    assert extract_main_text(page) == html_to_text_py(page)


# ------------------------------------------------ url_dedup gating

def test_url_dedup_gates_on_parse_not_output_prefix(spark):
    """ADVICE r8: strings normalize_url returns UNCHANGED but that
    happen to start with 'http' (httpfoo://, http:/x) must pass
    through, not dedup on the raw string."""
    from pipelinedb_spark.operators.text import url_dedup

    docs = spark.createDataFrame(
        [(1, "httpfoo://x"), (2, "httpfoo://x"),
         (3, "http:/x"), (4, "http:/x"),
         (5, "https://e.com/p"), (6, "https://E.com/p#z")],
        "doc_id long, url string")
    kept = url_dedup(docs).collect()
    assert {r["doc_id"] for r in kept} == {1, 2, 3, 4, 5}
    by_id = {r["doc_id"]: r["canonical_url"] for r in kept}
    assert by_id[1] is None and by_id[3] is None  # pass-through rows


def test_url_dedup_ref_param_functional_but_configurable(spark):
    """?ref= is functional on many sites: kept by default since r9;
    callers with tracker-style corpora opt back in."""
    from pipelinedb_spark.operators.text import url_dedup

    docs = spark.createDataFrame(
        [(1, "https://e.com/p?ref=main"),
         (2, "https://e.com/p?ref=dev")],
        "doc_id long, url string")
    assert {r["doc_id"] for r in url_dedup(docs).collect()} == {1, 2}
    opt_in = url_dedup(docs, tracking_params=("ref",)).collect()
    assert {r["doc_id"] for r in opt_in} == {1}


# ------------------------------- kcenter bit-replayable mode (r9)

def test_kcenter_start_id_and_exact_mode(spark):
    """start_id pins the seed exemplar and exact=True scores with the
    1e-8-quantized integer dot product — an int64 numpy replay (the
    same arithmetic, no float summation-order slack) reproduces the
    selection AND the distances to ~1e-12."""
    import numpy as np

    from pipelinedb_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    out = sorted(kcenter_select(df, k=6, start_id=3, exact=True)
                 .collect(), key=lambda r: r["sel_order"])
    assert out[0]["vec_id"] == 3 and out[0]["sel_order"] == 0

    q = np.floor(mat.astype(np.float64) * 1e8 + 0.5).astype(np.int64)

    def cos(i, j):
        dot = float((q[i] * q[j]).sum())
        return dot / np.sqrt(float((q[i] * q[i]).sum())
                             * float((q[j] * q[j]).sum()))

    sel, dists = [3], [float("inf")]
    d = np.array([1.0 - cos(i, 3) for i in range(40)])
    for _ in range(5):
        m = d.max()
        idx = max(i for i in range(40) if d[i] == m)  # max-id tiebreak
        sel.append(idx)
        dists.append(float(m))
        d = np.minimum(d, [1.0 - cos(i, idx) for i in range(40)])
    assert [r["vec_id"] for r in out] == sel
    for r, dd in zip(out[1:], dists[1:]):
        assert abs(r["sel_dist"] - dd) < 1e-12


def test_kcenter_default_seed_unaffected_by_new_params(spark):
    """Omitting start_id keeps the hash-order seed contract (the
    pre-r9 behavior, byte-for-byte)."""
    import numpy as np

    from pipelinedb_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(25, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(25)],
        "vec_id long, embedding array<float>")
    a = sorted((r["vec_id"], r["sel_order"])
               for r in kcenter_select(df, k=4).collect())
    b = sorted((r["vec_id"], r["sel_order"])
               for r in kcenter_select(df, k=4).collect())
    assert a == b and len(a) == 4


# -------------------------------- script-range language ID (r9)

_LANG_SAMPLES = [
    (1, "委员会详细审查了这项提案，认为第二稿已经回应了意见。", "zh"),
    (2, "これは日本語のテストです。漢字も含まれています。", "ja"),
    (3, "위원회는 제안서를 검토한 결과 대부분 반영되었다고 판단했다", "ko"),
    (4, "Комитет рассмотрел предложение и принял решение", "ru"),
    (5, "اللجنة راجعت الاقتراح بالتفصيل قبل الاجتماع", "ar"),
    (6, "समिति ने प्रस्ताव की समीक्षा की और निर्णय लिया", "hi"),
    (7, "คณะกรรมการตรวจสอบข้อเสนออย่างละเอียด", "th"),
    (8, "Η επιτροπή εξέτασε την πρόταση λεπτομερώς", "el"),
    (9, "the cat sat on the mat and it is a test", "en"),
    (10, "der hund und die katze ist nicht da", "de"),
    (11, "xyzzy qwerty asdf plugh", "und"),
    (12, "mostly english text with the and of plus 漢", "en"),
]


def test_lang_id_script_ranges(spark):
    """Round-9: the stopword heuristic is structurally blind to
    non-Latin scripts (every zh/ja/ko/ru/ar/hi/th/el page was 'und');
    the script-range tier decides them, Latin rows are unchanged, and
    a Han-only stray char below the 25% bar does not flip an English
    doc."""
    from pipelinedb_spark.operators.text import lang_id

    df = spark.createDataFrame([(i, t) for i, t, _ in _LANG_SAMPLES],
                               "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    for i, _, want in _LANG_SAMPLES:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_script_counts_match_duckdb(spark):
    """Cross-engine oracle: duckdb (RE2) counts the same script chars
    over the same ranges, and replaying the documented rule on those
    counts reproduces Spark's decision for every sample row."""
    import duckdb

    from pipelinedb_spark.operators.text import (LANG_ID_PREFIX,
                                                 SCRIPT_RANGES,
                                                 STOPWORDS, lang_id)

    con = duckdb.connect()
    rows = [(i, t) for i, t, _ in _LANG_SAMPLES]
    con.execute("CREATE TABLE s (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", rows)

    def re2(rng):  # [؀-ۿ] -> [\x{0600}-\x{06ff}]
        lo, hi = ord(rng[1]), ord(rng[3])
        return f"[\\x{{{lo:04x}}}-\\x{{{hi:04x}}}]"

    # r10: the script tier is a pure function of text[:LANG_ID_PREFIX]
    # — the oracle caps both the counts and the denominator the same way
    exprs = ", ".join(
        f"len(regexp_extract_all(substring(text, 1, {LANG_ID_PREFIX}), "
        f"'{re2(SCRIPT_RANGES[c])}')) AS c_{c}"
        for c in sorted(SCRIPT_RANGES))
    duck = con.execute(
        f"SELECT id, least(length(text), {LANG_ID_PREFIX}) AS chars, "
        f"{exprs} FROM s").df()

    def decide(row, text):
        counts = {c: int(row[f"c_{c}"]) for c in SCRIPT_RANGES}
        total = sum(counts.values())
        if total > 0 and total * 4 >= int(row["chars"]):
            best, bc = "und", 0
            for c in sorted(SCRIPT_RANGES):
                if counts[c] > bc:
                    best, bc = c, counts[c]
            # ja override is scoped to zh-dominant pages (r10)
            if (best == "zh" and counts["ja"] > 0
                    and counts["ja"] * 50 >= total):
                return "ja"
            return best
        best, bc = "und", 0
        words = text.split(" ")
        for lg in sorted(STOPWORDS):
            n = sum(w in STOPWORDS[lg] for w in words)
            if n > bc:
                best, bc = lg, n
        return best

    texts = dict(rows)
    want = {int(r["id"]): decide(r, texts[int(r["id"])])
            for _, r in duck.iterrows()}
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    assert got == want


def test_analyze_documents_lang_pred_uses_script_tier(spark):
    """analyze_documents' lang_pred column routes through the same
    two-tier rule as lang_id — and on the Latin-only test corpus the
    script tier never fires, so text_profile's oracle is unchanged."""
    from pipelinedb_spark.operators.text import analyze_documents, lang_id

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in _LANG_SAMPLES], "doc_id long, text string")
    prof = {r["doc_id"]: r["lang_pred"]
            for r in analyze_documents(df).collect()}
    via_fn = {r["doc_id"]: r["lang"]
              for r in df.select("doc_id",
                                 lang_id(F.col("text")).alias("lang"))
              .collect()}
    assert prof == via_fn
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = analyze_documents(docs.select("doc_id", "text"))
    langs = {r["lang_pred"] for r in out.select("lang_pred").distinct()
             .collect()}
    assert langs <= {"en", "de", "es", "fr", "tr", "vi", "und"}


def test_extraction_korean_body_survives_english_abstract(spark):
    """Review r9: a page with ONE good English block used to disable
    the page-level stopword-free mode, dropping the entire Korean
    body ('near' blocks fenced by bad nav).  The per-block script
    exemption keeps the body regardless of other blocks."""
    from pipelinedb_spark.operators.warc import extract_main_text

    abstract = ("This is the English abstract of the report and it is "
                "made of the usual function words that score well.")
    page = ("<html><body><p>" + abstract + "</p>" + _KO_NAV
            + "<article>"
            + "".join(f"<p>{p}</p>" for p in _KO_PARAS)
            + "</article>" + _KO_NAV + "</body></html>").encode()
    dense = extract_main_text(page)
    assert abstract in dense
    for p in _KO_PARAS:
        assert p in dense                 # body kept, not just abstract
    assert "메뉴3" not in dense            # nav still dropped


def test_extraction_latin_blob_gets_no_spacefree_pass(spark):
    """Review r9: the old words-per-char heuristic let any ≥60-char
    Latin block of few long tokens (base64 blobs, bare URLs) ride the
    exemption straight to 'good'.  Script-keyed exemption keeps such
    junk 'near' — on an otherwise-boilerplate page it is dropped with
    everything else (page tag-strips, blob not extracted as main
    text)."""
    from pipelinedb_spark.operators.warc import (_context_pass,
                                                 _first_pass)

    blob = "QWxhZGRpbjpvcGVuIHNlc2FtZQ" * 4          # 104 chars, 1 word
    url = ("https://example.com/a/very/long/path?x=" + "y" * 60)
    for junk in (blob, url):
        verdicts = _context_pass(_first_pass(
            [("Home About Products Pricing", 28, False),   # link-list
             (junk, 0, False),
             ("Contact Careers Blog Terms", 26, False)]))
        assert verdicts[1] != "good"      # no free pass for Latin junk
    # while a real CJK block in the same sandwich IS exempt
    zh = "委员会详细审查了这项提案，认为第二稿已经回应了大部分的意见。" * 2
    verdicts = _context_pass(_first_pass(
        [("Home About Products Pricing", 28, False),
         (zh, 0, False),
         ("Contact Careers Blog Terms", 26, False)]))
    assert verdicts[1] == "good"


def test_kcenter_duplicate_corpus_breaks_instead_of_repicking(spark):
    """Review r9: with duplicate vectors and k > n_distinct, float
    residuals (1 − x/√(x·x) ≈ +1e-16) could re-pick an
    already-selected exemplar instead of hitting the
    fewer-than-k-distinct break.  Epsilon break: output must hold
    each distinct vector once, no duplicates, in both modes."""
    from pipelinedb_spark.operators.similarity import (kcenter_numpy,
                                                       kcenter_select)

    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = [(i, base[i % 3]) for i in range(12)]   # 3 distinct, 12 rows
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for exact in (False, True):
        out = kcenter_select(df, k=8, start_id=0, exact=exact).collect()
        ids = [r["vec_id"] for r in out]
        assert len(ids) == len(set(ids))           # no re-picks
        assert len(ids) == 3                       # broke at n_distinct
        vecs = {tuple(base[i % 3]) for i in ids}
        assert len(vecs) == 3                      # one per distinct vec

    mat = np.array([base[i % 3] for i in range(12)], dtype=np.float64)
    sel, _ = kcenter_numpy(mat, k=8)
    assert len(sel) == len(set(sel)) == 3


# -------------------- threaded swap-loop invariants (r9 refactor)

@pytest.mark.parametrize("fmt", ["rename", "condput"])
def test_concurrent_append_compact_tag_loses_nothing(tmp_path, fmt):
    """Interleaving stress over the shared _swap_manifest loop:
    appenders, a compactor (replace + expected_dirs), and a tagger
    race freely.  Invariants at the end: the union of content lines
    across live dirs equals every appended token (compaction merges,
    never drops), every referenced dir exists on disk, and each app's
    txn tag holds its max epoch."""
    import pipelinedb_spark.indexstore as ixs

    root = str(tmp_path / f"idx-{fmt}")
    s = IndexStore(root, gc_grace_seconds=60.0)
    s.manifest_format = fmt
    s.init_if_needed()
    errs: list = []
    N_APP, N_EACH = 3, 12

    def appender(tid):
        st = IndexStore(root, gc_grace_seconds=60.0)
        try:
            for i in range(N_EACH):
                staged = st.stage()
                os.makedirs(staged)
                with open(os.path.join(staged, "f.txt"), "w") as f:
                    f.write(f"tok-{tid}-{i}")
                st.commit(staged, replace=False,
                          txn=(f"app{tid}", i), max_retries=50)
        except Exception as e:            # pragma: no cover
            errs.append(e)

    def compactor():
        st = IndexStore(root, gc_grace_seconds=60.0)
        try:
            for _ in range(8):
                time.sleep(0.05)
                paths = st.dirs()
                if len(paths) < 2:
                    continue
                lines = []
                for p in paths:
                    with open(os.path.join(p, "f.txt")) as f:
                        lines.extend(f.read().splitlines())
                staged = st.stage()
                os.makedirs(staged)
                with open(os.path.join(staged, "f.txt"), "w") as f:
                    f.write("\n".join(lines))
                try:
                    st.commit(staged, replace=True,
                              expected_dirs=[os.path.basename(p)
                                             for p in paths],
                              on_extra="keep", max_retries=50)
                except ixs.CommitConflict:
                    pass  # lost to a concurrent replace: no data moved
        except Exception as e:            # pragma: no cover
            errs.append(e)

    def tagger():
        st = IndexStore(root, gc_grace_seconds=60.0)
        try:
            for i in range(10):
                st.tag(txn=("tagger", i), max_retries=50)
                time.sleep(0.02)
        except Exception as e:            # pragma: no cover
            errs.append(e)

    ts = ([threading.Thread(target=appender, args=(t,))
           for t in range(N_APP)]
          + [threading.Thread(target=compactor),
             threading.Thread(target=tagger)])
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs

    st = IndexStore(root, gc_grace_seconds=60.0)
    got: list[str] = []
    for p in st.dirs():
        assert os.path.isdir(p)           # every referenced dir exists
        with open(os.path.join(p, "f.txt")) as f:
            got.extend(f.read().splitlines())
    want = {f"tok-{t}-{i}" for t in range(N_APP) for i in range(N_EACH)}
    assert sorted(got) == sorted(want)    # nothing lost, nothing doubled
    for t in range(N_APP):
        assert st.txn_version(f"app{t}") == N_EACH - 1
    assert st.txn_version("tagger") == 9


_VI_PARAS = [
    "Ủy ban đã xem xét kỹ lưỡng đề xuất này và cho rằng bản thảo thứ "
    "hai đã phản hồi phần lớn các ý kiến phản đối trước khi cuộc họp "
    "được triệu tập để mọi thành viên xem xét trước.",
    "Sau cuộc thảo luận kéo dài về ngân sách, các thành viên đồng ý "
    "chia khoản kinh phí mới trong ba năm để không bộ phận nào phải "
    "gánh toàn bộ chi phí trong một năm duy nhất.",
]
_VI_NAV = ('<div class="menu">' + " ".join(
    f'<a href="/{i}">Mục{i}</a>' for i in range(10)) + "</div>")


def test_extraction_latin_stopwordfree_page_uses_pagelevel_mode(spark):
    """Vietnamese: Latin-adjacent script (words/char high, no script-
    range chars) sharing no stopwords with the union — per-block
    exemption does NOT apply, so this page exercises the PAGE-level
    degenerate-signal rescore (the branch Korean used to cover before
    it moved to the per-block script exemption)."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    page = ("<html><body>" + _VI_NAV
            + "<article>"
            + "".join(f"<p>{p}</p>" for p in _VI_PARAS)
            + "</article>" + _VI_NAV + "</body></html>").encode()
    dense = extract_main_text(page)
    assert dense != html_to_text_py(page)     # not the fallback
    for p in _VI_PARAS:
        assert p in dense
    assert "Mục3" not in dense                # nav dropped


def test_extraction_japanese_mixed_kana_kanji(spark):
    """Japanese blocks are kanji+kana mixtures — both ranges are in
    the blind set, so the block exemption holds for the mixture, and
    the article survives while the link-list nav drops."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    paras = [
        "委員会はこの提案を詳細に審査し、第二稿がほとんどの反対意見に"
        "すでに対応していると判断しました。会議の前に全員へ配布されて"
        "いたため、各委員は事前に内容を確認することができました。",
        "予算に関する長い議論の後、委員たちは新しい資金を三年間に分けて"
        "執行することで合意し、どの部門も一年間で全額を負担しなくて"
        "済むようにしました。",
    ]
    nav = ('<div class="menu">' + " ".join(
        f'<a href="/{i}">メニュー{i}</a>' for i in range(10)) + "</div>")
    page = ("<html><body>" + nav + "<article>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + "</article>" + nav + "</body></html>").encode()
    dense = extract_main_text(page)
    assert dense != html_to_text_py(page)
    for p in paras:
        assert p in dense
    assert "メニュー3" not in dense


def test_extraction_khmer_body_survives_english_abstract(spark):
    """Review r9 (second pass): the blind-script class is the
    complement of the Latin ranges, not an explicit list — scripts
    outside the lang-ID set (Khmer here) keep the exemption even when
    a good English block disables the page-level mode."""
    from pipelinedb_spark.operators.warc import extract_main_text

    abstract = ("This is the English abstract of the report and it is "
                "made of the usual function words that score well.")
    km = ("គណៈកម្មការបានពិនិត្យមើលសំណើនេះយ៉ាងលម្អិត ហើយយល់ថាសេចក្តីព្រាងទីពីរ"
          "បានឆ្លើយតបនឹងមតិភាគច្រើនរួចហើយ មុនពេលកិច្ចប្រជុំត្រូវបានកោះប្រជុំ។")
    nav = ('<div class="menu">' + " ".join(
        f'<a href="/{i}">link{i}</a>' for i in range(10)) + "</div>")
    page = ("<html><body><p>" + abstract + "</p>" + nav
            + f"<article><p>{km}</p><p>{km}</p></article>"
            + nav + "</body></html>").encode()
    dense = extract_main_text(page)
    assert abstract in dense
    assert km in dense
    assert "link3" not in dense


def test_lock_release_is_compare_and_delete(tmp_path):
    """Review r9 (second pass): a committer whose lock was stolen
    while it stalled must not delete the NEW owner's live lock on
    exit — release compares the token first."""
    s = IndexStore(str(tmp_path / "idx"))
    s.init_if_needed()
    lock = os.path.join(s.root, "_commit.lock")
    with s._commit_lock():
        with open(lock, "w") as f:      # theft mid-section
            f.write("thief-token")
    with open(lock) as f:
        assert f.read() == "thief-token"   # NOT deleted on exit
    os.remove(lock)
    # normal path still releases
    with s._commit_lock():
        pass
    assert not os.path.exists(lock)


def test_commit_retries_when_lock_stolen_mid_section(
        tmp_path, monkeypatch):
    """The ownership backstop: a commit that loses its lock between
    derive and write re-acquires and lands EXACTLY once."""
    s = IndexStore(str(tmp_path / "idx"))
    s.init_if_needed()
    calls = {"n": 0}
    orig = IndexStore._lock_owned

    def stolen_once(self, token):
        calls["n"] += 1
        if calls["n"] == 1:
            return False               # theft at the worst moment
        return orig(self, token)

    monkeypatch.setattr(IndexStore, "_lock_owned", stolen_once)
    _add(s, "x")
    assert calls["n"] >= 2
    assert len(s.dirs()) == 1          # exactly one committed dir
    assert s.read_manifest()["version"] == 1


def test_extraction_mojibake_and_symbol_art_not_exempt(spark):
    """Review r9 (third pass): U+FFFD replacement runs and symbol art
    are not LETTERS of any script — they get no stopword exemption
    and never surface as main text on an otherwise-boilerplate
    page."""
    from pipelinedb_spark.operators.warc import (_context_pass,
                                                 _first_pass)

    for junk in ("�" * 80, "★★★★☆ → ← ↑ ↓ ✦ ✧ " * 6):
        verdicts = _context_pass(_first_pass(
            [("Home About Products Pricing", 28, False),
             (junk, 0, False),
             ("Contact Careers Blog Terms", 26, False)]))
        assert verdicts[1] != "good"
