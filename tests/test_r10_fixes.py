"""Round-10 fixes, each with its own regression:

* vi/tr stopword tiers — Latin-script languages the script tier is
  structurally blind to (their script IS Latin) lang-ID'd 'und'
  (round-9 "What's missing" #5).
* ja kana-override scoped to zh-dominant pages — a Korean/Russian page
  quoting a line of Japanese must stay ko/ru (ADVICE round 9).
* script tier decides on text[:LANG_ID_PREFIX] — 8 full-text regexp
  scans per document regressed text_profile 42% at sf0.1 and would be
  paid per-document at 100 TB (round-9 verdict What's-wrong #2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# vi/tr/en/de sample rows; short Latin text, script tier never fires
_VI_TR_SAMPLES = [
    (1, "đây là một bài kiểm tra và nó có kết quả không được tốt", "vi"),
    (2, "người dùng của hệ thống và một số bạn là thành viên", "vi"),
    (3, "bu bir test ve çok daha iyi olarak kabul edildi", "tr"),
    (4, "bu proje için bir rapor ve daha fazla bilgi ile geldi", "tr"),
    (5, "the committee reviewed the proposal and it is a test", "en"),
    (6, "der hund und die katze ist nicht da", "de"),
    (7, "xyzzy qwerty asdf plugh", "und"),
]


def test_lang_id_vi_tr(spark):
    from pipelinedb_spark.operators.text import lang_id

    df = spark.createDataFrame([(i, t) for i, t, _ in _VI_TR_SAMPLES],
                               "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    for i, _, want in _VI_TR_SAMPLES:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_vi_tr_duckdb_replay(spark):
    """Cross-engine oracle: duckdb counts the same stopword tokens and
    replaying the documented argmax rule (strict-greater, language-code
    scan order) reproduces Spark's decision for every row."""
    import duckdb

    from pipelinedb_spark.operators.text import STOPWORDS, lang_id

    con = duckdb.connect()
    rows = [(i, t) for i, t, _ in _VI_TR_SAMPLES]
    con.execute("CREATE TABLE s (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", rows)
    exprs = ", ".join(
        "len(list_filter(string_split(text, ' '), w -> w IN ("
        + ", ".join("'" + w + "'" for w in STOPWORDS[lg]) + f"))) AS c_{lg}"
        for lg in sorted(STOPWORDS))
    duck = con.execute(f"SELECT id, {exprs} FROM s").df()

    def decide(row):
        best, bc = "und", 0
        for lg in sorted(STOPWORDS):
            n = int(row[f"c_{lg}"])
            if n > bc:
                best, bc = lg, n
        return best

    want = {int(r["id"]): decide(r) for _, r in duck.iterrows()}
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    assert got == want
    # and the oracle itself must agree with the labeled expectations
    labels = {i: want_l for i, _, want_l in _VI_TR_SAMPLES}
    assert want == labels


def test_ja_override_scoped_to_zh_dominant(spark):
    """ADVICE r9: the kana override exists only to split ja from zh
    (kanji count as Han).  It must not outrank a dominant non-Han
    script: a Korean or Russian page quoting Japanese stays ko/ru."""
    from pipelinedb_spark.operators.text import lang_id

    ko_body = "위원회는 제안서를 검토한 결과 대부분 반영되었다고 판단했다 " * 5
    ru_body = "Комитет рассмотрел предложение и принял решение вчера " * 5
    ja_quote = "これはテスト"  # >=2% kana of script chars, quoted line
    samples = [
        (1, ko_body + ja_quote, "ko"),
        (2, ru_body + ja_quote, "ru"),
        # kanji-dominant Japanese (Han argmax, kana >=2%) -> the
        # override's job: without it this would mislabel as zh
        (3, "経済産業省は新政策を発表した" * 4, "ja"),
        # pure Han, no kana -> zh
        (4, "委员会详细审查了这项提案认为第二稿已经回应了意见", "zh"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples],
                               "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    for i, _, want in samples:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_prefix_cap(spark):
    """The script tier is a pure function of text[:LANG_ID_PREFIX]:
    a document whose first 4 KB is English prose stays 'en' no matter
    how much Hangul follows, and one whose first 4 KB is Hangul stays
    'ko' no matter how much Latin follows."""
    from pipelinedb_spark.operators.text import (LANG_ID_PREFIX,
                                                 analyze_documents,
                                                 lang_id)

    en_head = ("the committee reviewed the proposal and it is a test "
               * (LANG_ID_PREFIX // 50))[:LANG_ID_PREFIX]
    ko_head = ("위원회는 제안서를 검토한 결과 대부분 반영되었다 "
               * (LANG_ID_PREFIX // 20))[:LANG_ID_PREFIX]
    ko_tail = "한글 본문이 계속 이어진다 " * 2000
    en_tail = " the and of to in is that a " * 2000
    samples = [
        (1, en_head + " " + ko_tail, "en"),
        (2, ko_head + " " + en_tail, "ko"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["lang"]
           for r in df.select("doc_id",
                              lang_id(F.col("text")).alias("lang"))
           .collect()}
    for i, _, want in samples:
        assert got[i] == want, (i, got[i], want)
    # analyze_documents routes through the identical capped rule
    prof = {r["doc_id"]: r["lang_pred"]
            for r in analyze_documents(df).collect()}
    assert prof == got


# ------------------- bm25_search_many repartition gate (three shapes)

def test_bm25_search_many_repartition_gate(spark):
    """Round-9 verdict What's-wrong #3: the single-exchange rewrite
    collapses aggregation parallelism to <= n_queries partitions, so
    it must engage only when n_queries covers the shuffle width.
    Three plan shapes, identical scores:

    * small query set  -> Catalyst two-exchange plan (first agg on
      hash(query_id, doc_id) across all cores, no explicit
      repartition)
    * large + broadcast qidf      -> single query_id exchange
    * large + shuffle-hash fallback -> single query_id exchange
    """
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

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # shape 1: 3 queries < 8 shuffle partitions -> NO explicit
    # repartition (REPARTITION_BY_COL); Catalyst reuses the doc_id
    # join exchange for the (query_id, doc_id) aggregation — full
    # shuffle-width parallelism on the wide stage — and only the
    # post-agg rows take the narrow query_id window exchange.
    small = bm25_search_many(idx, queries, k=5)
    p1 = plan(small)
    assert "REPARTITION_BY_COL" not in p1, p1

    # shapes 2+3: force the gate with a tiny shuffle width; the
    # explicit query_id repartition appears and is the ONLY
    # query_id-keyed exchange (it serves both the agg and the window)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        large_b = bm25_search_many(idx, queries, k=5)
        p2 = plan(large_b)
        assert "BroadcastHashJoin" in p2
        assert "REPARTITION_BY_COL" in p2, p2
        # the explicit repartition is the ONLY query_id-alone exchange
        # (it serves both the agg and the window; no ENSURE_REQUIREMENTS
        # re-exchange on query_id remains)
        import re
        assert not re.search(
            r"hashpartitioning\(query_id#\d+L?, \d+\), ENSURE_REQUIREMENTS",
            p2), p2
        large_s = bm25_search_many(idx, queries, k=5,
                                   broadcast_max_bytes=0)
        p3 = plan(large_s)
        assert "ShuffledHashJoin" in p3
        assert "REPARTITION_BY_COL" in p3, p3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    def rows(df):
        return sorted((r["query_id"], r["doc_id"], r["rank"],
                       round(r["score"], 9)) for r in df.collect())

    a, b, c = rows(small), rows(large_b), rows(large_s)
    assert a == b == c and a


# ------------- rename-mode stolen-lock post-write verification (r10)
#
# Rename manifests have no CAS, so a lock stolen in the microsecond
# between the ownership check and os.replace lets the thief's
# read-modify-write race ours (ADVICE round 9 — "silently dropping
# the loser's appended dir").  _swap_manifest now re-verifies
# ownership AFTER the write: if the head is no longer our write and
# our committed dir is not in its ancestry, the commit re-derives and
# re-writes; if the write survived, it stands without a double-fold.

import contextlib
import json
import os


def _mk_add(store, content, **kw):
    staged = store.stage()
    os.makedirs(staged)
    with open(os.path.join(staged, "f.txt"), "w") as f:
        f.write(content)
    return store.commit(staged, replace=False, **kw)


def test_rename_steal_mid_write_append_not_lost(tmp_path, monkeypatch):
    from pipelinedb_spark.indexstore import IndexStore
    from pipelinedb_spark.manifestio import RenameManifestIO

    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="rename")
    s.init_if_needed(meta={"cnt": 0})
    _mk_add(s, "a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    pre_manifest = s.read_manifest()
    lockpath = os.path.join(root, "_commit.lock")

    orig_write = RenameManifestIO.write
    state = {"armed": True}

    def write_with_thief(self, m, base_seq):
        orig_write(self, m, base_seq)
        if state["armed"] and self.path.endswith("_manifest.json"):
            state["armed"] = False
            # thief: read the manifest BEFORE our write (pre-state),
            # stole our lock while we stalled, writes AFTER ours —
            # clobbering our append — then finishes and releases
            thief = {"version": pre_manifest["version"] + 1,
                     "dirs": list(pre_manifest["dirs"]) + ["v99999-feed"],
                     "meta": dict(pre_manifest["meta"])}
            orig_write(self, thief, 0)
            try:
                os.remove(lockpath)     # thief released
            except OSError:
                pass

    monkeypatch.setattr(RenameManifestIO, "write", write_with_thief)
    mine = _mk_add(s, "b", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    monkeypatch.setattr(RenameManifestIO, "write", orig_write)

    m = s.read_manifest()
    assert os.path.basename(mine) in m["dirs"]      # NOT lost
    assert "v99999-feed" in m["dirs"]               # thief's kept too
    assert m["meta"]["cnt"] == 2                    # folded exactly once


def test_rename_steal_but_write_survives_no_refold(tmp_path,
                                                   monkeypatch):
    """The other steal interleaving: the thief took the lock but our
    os.replace landed last — the commit must stand AS IS (no second
    rename, no double meta fold)."""
    from pipelinedb_spark.indexstore import IndexStore
    from pipelinedb_spark.manifestio import RenameManifestIO

    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="rename")
    s.init_if_needed(meta={"cnt": 0})
    lockpath = os.path.join(root, "_commit.lock")

    orig_write = RenameManifestIO.write
    state = {"armed": True}

    def write_then_steal_token(self, m, base_seq):
        orig_write(self, m, base_seq)
        if state["armed"] and self.path.endswith("_manifest.json"):
            state["armed"] = False
            with open(lockpath, "w") as f:   # thief holds the lock now
                f.write("thief-token")

    monkeypatch.setattr(RenameManifestIO, "write",
                        write_then_steal_token)
    mine = _mk_add(s, "a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    monkeypatch.setattr(RenameManifestIO, "write", orig_write)
    os.remove(lockpath)                      # thief eventually releases

    m = s.read_manifest()
    assert m["dirs"] == [os.path.basename(mine)]
    assert m["meta"]["cnt"] == 1             # no refold
    assert m["version"] == 1                 # no second commit


# -------------------- lang_id fuzz oracle vs pure-Python replica

def _lang_id_replica(text):
    """Exact Python restatement of the documented two-tier rule —
    independent of Spark and of the duckdb oracles."""
    from pipelinedb_spark.operators.text import (LANG_ID_PREFIX,
                                                 SCRIPT_RANGES,
                                                 STOPWORDS)
    words = text.split(" ")
    head = text[:LANG_ID_PREFIX]
    best, bc = "und", 0
    for lg in sorted(STOPWORDS):
        n = sum(w in STOPWORDS[lg] for w in words)
        if n > bc:
            best, bc = lg, n
    if best == "und":  # r11 vi-diacritic fallback (only 'und' rows)
        dia = sum("Ḁ" <= ch <= "ỿ" for ch in head)
        if len(head) > 0 and dia * 20 >= len(head):
            best = "vi"
    rng = {c: (ord(SCRIPT_RANGES[c][1]), ord(SCRIPT_RANGES[c][3]))
           for c in SCRIPT_RANGES}
    counts = {c: sum(lo <= ord(ch) <= hi for ch in head)
              for c, (lo, hi) in rng.items()}
    total = sum(counts.values())
    if total > 0 and total * 4 >= len(head):
        sbest, sbc = "und", 0
        for c in sorted(SCRIPT_RANGES):
            if counts[c] > sbc:
                sbest, sbc = c, counts[c]
        if (sbest == "zh" and counts["ja"] > 0
                and counts["ja"] * 50 >= total):
            return "ja"
        return sbest
    return best


def test_lang_id_fuzz_vs_replica(spark):
    """300 seeded random texts mixing stopwords of all 6 languages,
    random Latin junk, and random codepoints drawn from every tracked
    script range (BMP only, as are all 8 ranges) at random densities
    — Spark's lang_id must equal the pure-Python replica on every
    row, including argmax ties, the 25% engagement bar, the zh-scoped
    kana override, and the prefix cap."""
    import random

    from pipelinedb_spark.operators.text import (SCRIPT_RANGES,
                                                 STOPWORDS, lang_id)

    rnd = random.Random(20260815)
    ranges = {c: (ord(SCRIPT_RANGES[c][1]), ord(SCRIPT_RANGES[c][3]))
              for c in SCRIPT_RANGES}
    all_sw = [w for ws in STOPWORDS.values() for w in ws]

    def junk_word():
        return "".join(rnd.choice("bcdfghjklmnpqrstvwxz")
                       for _ in range(rnd.randint(2, 8)))

    def script_run(c, n):
        lo, hi = ranges[c]
        return "".join(chr(rnd.randint(lo, hi)) for _ in range(n))

    texts = []
    for i in range(300):
        parts = []
        for _ in range(rnd.randint(1, 30)):
            roll = rnd.random()
            if roll < 0.4:
                parts.append(rnd.choice(all_sw))
            elif roll < 0.7:
                parts.append(junk_word())
            else:
                parts.append(script_run(rnd.choice(list(ranges)),
                                        rnd.randint(1, 40)))
        texts.append((i, " ".join(parts)))
    # a few adversarial shapes: empty, script-only, > prefix length
    texts += [(300, ""), (301, script_run("ko", 50)),
              (302, "the " * 1200 + script_run("ko", 3000)),
              (303, script_run("zh", 90) + script_run("ja", 4))]

    df = spark.createDataFrame(texts, "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    want = {i: _lang_id_replica(t) for i, t in texts}
    diffs = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not diffs, dict(list(diffs.items())[:5])


# ------------------- dedup_clusters: pointer jumping + union-find fuzz

def test_dedup_clusters_fuzz_vs_union_find(spark):
    """Differential oracle: random graphs (sparse random, cliques,
    stars, and a 60-node PATH whose diameter defeats the old
    20-round plain min-propagation) — labels must equal a python
    union-find's component minima exactly.  The old loop returned
    silently-partial clusters on the path; the pointer-jumped loop
    converges in O(log diameter) rounds or raises."""
    import random

    from pipelinedb_spark.operators.dedup import dedup_clusters

    rnd = random.Random(101)
    cases = []
    # sparse random graphs
    for n, m in ((30, 25), (80, 60), (120, 200)):
        cases.append([(rnd.randrange(n), rnd.randrange(n))
                      for _ in range(m)])
    # a clique + a star + a long path in one graph
    clique = [(i, j) for i in range(200, 206) for j in range(i + 1, 206)]
    star = [(300, 300 + i) for i in range(1, 15)]
    path = [(400 + i, 401 + i) for i in range(60)]
    cases.append(clique + star + path)

    def union_find(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        df = spark.createDataFrame(pairs, "d1 long, d2 long")
        got = {r["doc_id"]: r["cluster_id"]
               for r in dedup_clusters(df).collect()}
        want = union_find(pairs)
        assert got == want, {k: (got.get(k), want[k])
                             for k in want if got.get(k) != want[k]}


def test_dedup_clusters_nonconvergence_raises(spark):
    """A diameter past the round budget must raise, never return
    silently-partial clusters."""
    import pytest as _pytest

    from pipelinedb_spark.operators.dedup import dedup_clusters

    path = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(path, "d1 long, d2 long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(df, max_iterations=2)
    # and with the budget it converges to one cluster
    got = dedup_clusters(df, max_iterations=20).collect()
    assert {r["cluster_id"] for r in got} == {0}


def test_url_dedup_single_shuffle_plan(spark):
    """Round-10 plan shape: keep-min-id is one window exchange over
    only the dedupable rows; pass-through (non-http) rows ride a
    shuffle-free union branch — the old groupBy+join shape shuffled
    the full table twice, NULL keys included."""
    from pipelinedb_spark.operators.text import url_dedup

    docs = spark.createDataFrame(
        [(1, "https://E.com/page?utm_source=a"),
         (2, "https://e.com/page"),
         (3, "not a url"),
         (4, "ftp://e.com/x"),
         (5, "https://e.com/other")],
        "doc_id long, url string")
    out = url_dedup(docs)
    # plan BEFORE collect: post-execution AQE toString appends an
    # "Initial Plan" section that duplicates every exchange line
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Union" in plan
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4, 5}
