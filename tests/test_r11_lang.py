"""Round-11 lang-ID work, each piece with its own regression:

* it/pt/nl promoted into the STOPWORDS tier (round-10 verdict
  What's-missing #5) — marker sets collision-checked and the decision
  replayed in duckdb, the r10 vi/tr template.
* the per-language stopword passes fused into ONE F.aggregate fold
  (stopword_count_vec) — adding a language must not add a token-array
  traversal per document; the fold must equal the per-language
  filter-pass counts exactly, and the scalar lang_id path must agree
  with the analyze_documents path row-for-row.
* Vietnamese diacritic-density fallback — a vi page with few function
  words (listings, tables) still carries tone-marked letters
  (U+1E00–U+1EFF) in its content words; only 'und' rows may change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# it/pt/nl fixtures alongside carried en/de/fr/es/tr/vi shapes; short
# Latin text, the script tier never fires.
_LANG_SAMPLES = [
    (1, "si dice che della nostra squadra sono anche i più forti e "
        "questo conta nel risultato", "it"),
    (2, "gli amici sono arrivati anche se questo non era previsto "
        "perché il treno era più lento", "it"),
    (3, "não sei se você já viu isso mas também acho uma boa ideia "
        "até amanhã", "pt"),
    (4, "as obras são grandes e você já sabe que isso não vai mudar "
        "até o fim", "pt"),
    (5, "dit is een huis dat niet groot is maar ook niet klein voor "
        "deze mensen die er zijn", "nl"),
    (6, "wij hebben een plan en het is niet slecht maar ook niet "
        "goed voor deze groep", "nl"),
    # carried languages must be untouched by the new sets
    (7, "the committee reviewed the proposal and it is a test", "en"),
    (8, "der hund und die katze ist nicht da", "de"),
    (9, "le chat est dans la maison et les enfants sont là", "fr"),
    (10, "el perro y la casa de los niños es un lugar", "es"),
    (11, "bu bir test ve çok daha iyi olarak kabul edildi", "tr"),
    (12, "người dùng của hệ thống và một số bạn là thành viên", "vi"),
    (13, "xyzzy qwerty asdf plugh", "und"),
    # vi diacritic fallback: listing-style vi with ZERO function
    # words — every stopword count is 0, but tone-marked letters
    # (ộ ậ ả ế …) are >=5% of the chars
    (14, "phở bún chả bánh mì gỏi cuốn chả giò hủ tiếu mỳ", "vi"),
    (15, "sản phẩm chất lượng giá rẻ giao hàng nhanh", "vi"),
    # sparse diacritics (<5%): stays 'und' — one ạ in a long ASCII run
    (16, "ạ " + "qwrt zxcv bnml " * 8, "und"),
    # r11b: pl/id/sv ride the one-fold vector (zero extra passes)
    (17, "się okazało że to jest tylko test oraz może nic więcej "
         "przez przypadek która działa żeby", "pl"),
    (18, "przez ostatnie lata jest tylko jedna rzecz która może się "
         "zmienić żeby było lepiej", "pl"),
    (19, "rumah ini adalah tempat yang baik untuk keluarga dan teman "
         "dengan banyak ruang tidak jauh", "id"),
    (20, "itu bukan masalah yang besar untuk kami dan semua orang "
         "dengan rencana ini", "id"),
    (21, "det är inte så svårt att förstå och på många sätt från "
         "början", "sv"),
    (22, "vi har ett hus och det är inte stort på något sätt från "
         "utsidan att se", "sv"),
    # r11c: cs/da/fi/hu/ro ride the same one-fold vector
    (23, "jeg ved ikke hvad du mener og hvor det skal være men "
         "nogle gange er også godt", "da"),
    (24, "og hvor kan jeg finde nogle gode steder som ikke er dyre "
         "og også billige", "da"),
    (25, "en tiedä mutta hän sanoi että se on myös niin hyvä kuin "
         "luulin ja jos sataa", "fi"),
    (26, "että tämä toimii niin hyvin kuin myös sekä se mutta ei "
         "ole jos kaikki menee", "fi"),
    (27, "jsem si jist že to není jen test ale být však již pouze "
         "začátek této cesty", "cs"),
    (28, "že to však není pouze o tom jsem již věděl a být této "
         "věci blíž", "cs"),
    (29, "și nu este clar pentru mine dar sunt sigur că după aceea "
         "până mâine fără să știm această", "ro"),
    (30, "sunt multe lucruri pentru care să luptăm și fără această "
         "teamă până mâine după program", "ro"),
    (31, "azt hiszem hogy ez csak egy teszt és már nem kell még "
         "vagy mint korábban", "hu"),
    (32, "és hogy miért csak most jött el még egy lehetőség vagy "
         "már mint mindig", "hu"),
    # documented tie semantics: c_da == c_sv == 1 → first max in
    # language-code order → 'da'
    (33, "det og", "da"),
    # documented blend: Norwegian bokmål shares the Danish function
    # words — no pages ID as the nearest covered language, 'da'
    (34, "jeg vet ikke hvor de er og om det går også bra", "da"),
]


def test_marker_sets_disjoint():
    """The selection rule for every PROMOTED language (r10 tr/vi, r11
    it/pt/nl): no marker may collide with any other covered
    language's marker set (a shared word bleeds counts across
    languages on every page).  The original es/fr sets share
    la/que/un — grandfathered: rewriting them would flip existing
    es/fr predictions, and their overlap is symmetric (both counts
    rise together, the earlier code wins ties exactly as documented)."""
    from pipelinedb_spark.operators.text import STOPWORDS

    langs = sorted(STOPWORDS)
    assert langs == ["cs", "da", "de", "en", "es", "fi", "fr", "hu",
                     "id", "it", "nl", "pl", "pt", "ro", "sv", "tr",
                     "vi"]
    promoted = ["cs", "da", "fi", "hu", "id", "it", "nl", "pl",
                "pt", "ro", "sv", "tr", "vi"]
    for a in promoted:
        for b in langs:
            if a == b:
                continue
            shared = set(STOPWORDS[a]) & set(STOPWORDS[b])
            assert not shared, (a, b, shared)
    for lg in langs:
        assert len(STOPWORDS[lg]) == 8, lg


def test_lang_id_it_pt_nl_and_vi_fallback(spark):
    from pipelinedb_spark.operators.text import lang_id

    df = spark.createDataFrame([(i, t) for i, t, _ in _LANG_SAMPLES],
                               "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    for i, _, want in _LANG_SAMPLES:
        assert got[i] == want, (i, got[i], want)


def test_analyze_documents_agrees_with_lang_id(spark):
    """The fused-fold DataFrame path (analyze_documents) and the
    scalar Column path (lang_id) implement the same documented rule
    on documents within LANG_ID_PREFIX — they must agree on every
    fixture row, including fallback rows.  (Beyond the prefix the
    two surfaces diverge BY DESIGN since r12 — see
    test_lang_id_prefix_cap_documented_divergence.)"""
    from pipelinedb_spark.operators.text import analyze_documents, lang_id

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in _LANG_SAMPLES], "doc_id long, text string")
    via_analyze = {r["doc_id"]: r["lang_pred"]
                   for r in analyze_documents(df)
                   .select("doc_id", "lang_pred").collect()}
    via_scalar = {r["doc_id"]: r["lang"]
                  for r in df.select(
                      "doc_id", lang_id(F.col("text")).alias("lang"))
                  .collect()}
    assert via_analyze == via_scalar


def test_lang_id_prefix_cap_documented_divergence(spark):
    """r12 (round-11 verdict low #2): standalone lang_id is a pure
    function of text[:LANG_ID_PREFIX] — its stopword fold is capped
    to the head, bounding per-document cost on megabyte docs.  A
    >4 KB document whose head is German and whose (much longer) tail
    is English must decide 'de' on the scalar path; analyze_documents
    folds the full materialized token array and decides 'en' — the
    documented divergence, each surface matching its own oracle."""
    from pipelinedb_spark.operators.text import (LANG_ID_PREFIX,
                                                 analyze_documents,
                                                 lang_id)

    head = "der die das und nicht ist ich ein " * 130   # ≈4.4 KB de
    tail = "the a of and to in is that " * 600           # ≈17 KB en
    assert len(head) > LANG_ID_PREFIX
    df = spark.createDataFrame([(1, head + tail)],
                               "doc_id long, text string")
    scalar = df.select(lang_id(F.col("text")).alias("lang")) \
        .collect()[0]["lang"]
    full = analyze_documents(df).collect()[0]["lang_pred"]
    assert scalar == "de"
    assert full == "en"
    # within the prefix the same document's head alone agrees on
    # both surfaces
    df_head = spark.createDataFrame(
        [(1, head[:LANG_ID_PREFIX])], "doc_id long, text string")
    assert df_head.select(lang_id(F.col("text")).alias("lang")) \
        .collect()[0]["lang"] == "de"
    assert analyze_documents(df_head).collect()[0]["lang_pred"] == "de"


def test_stopword_vec_equals_per_language_filters(spark):
    """The one-fold vector must equal the r10 per-language
    F.size(F.filter(...)) passes exactly, element by element."""
    from pipelinedb_spark.operators.text import (STOPWORDS, _LANGS,
                                                 stopword_count,
                                                 stopword_count_vec,
                                                 tokens)

    df = spark.createDataFrame([(i, t) for i, t, _ in _LANG_SAMPLES],
                               "id long, text string")
    cols = [stopword_count_vec(tokens(F.col("text"))).alias("vec")]
    cols += [stopword_count(F.col("text"), lg).alias(f"c_{lg}")
             for lg in _LANGS]
    for r in df.select(*cols).collect():
        assert list(r["vec"]) == [r[f"c_{lg}"] for lg in _LANGS]


def test_lang_id_duckdb_replay(spark):
    """Cross-engine oracle (the r10 vi/tr template widened to nine
    languages + the diacritic fallback): duckdb counts the same
    stopword tokens and tone-marked chars; replaying the documented
    rule reproduces Spark's decision for every fixture row."""
    import duckdb

    from pipelinedb_spark.operators.text import (LANG_ID_PREFIX,
                                                 STOPWORDS, lang_id)

    con = duckdb.connect()
    rows = [(i, t) for i, t, _ in _LANG_SAMPLES]
    con.execute("CREATE TABLE s (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", rows)
    # r12: the standalone lang_id caps its stopword fold to the same
    # prefix as the script/vi tiers — the replica mirrors the cap
    exprs = ", ".join(
        f"len(list_filter(string_split(substr(text, 1, "
        f"{LANG_ID_PREFIX}), ' '), w -> w IN ("
        + ", ".join("'" + w + "'" for w in STOPWORDS[lg]) + f"))) AS c_{lg}"
        for lg in sorted(STOPWORDS))
    duck = con.execute(
        f"SELECT id, {exprs}, "
        f"len(regexp_extract_all(substr(text, 1, {LANG_ID_PREFIX}), "
        f"'[Ḁ-ỿ]')) AS n_dia, "
        f"length(substr(text, 1, {LANG_ID_PREFIX})) AS n_head "
        f"FROM s").df()

    def decide(row):
        best, bc = "und", 0
        for lg in sorted(STOPWORDS):
            n = int(row[f"c_{lg}"])
            if n > bc:
                best, bc = lg, n
        if best == "und" and int(row["n_head"]) > 0 \
                and int(row["n_dia"]) * 20 >= int(row["n_head"]):
            best = "vi"
        return best

    want = {int(r["id"]): decide(r) for _, r in duck.iterrows()}
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"]
           for r in df.select("id", lang_id(F.col("text")).alias("lang"))
           .collect()}
    assert got == want
    # and the oracle itself must agree with the labeled expectations
    assert want == {i: w for i, _, w in _LANG_SAMPLES}


def test_analyze_documents_whole_stage_codegen_compiles(spark):
    """Round-11 regression: at 12 languages a per-language when-chain
    argmax pushed the generated processNext() past janino's 64 KB
    method limit — codegen failed and the WHOLE stage silently ran
    interpreted (7x at sf0.1).  With codegen fallback disabled, a
    compile failure throws instead of degrading, so this executes the
    full profile plan under that regime."""
    import pyspark.sql.functions as F

    from pipelinedb_spark.operators.text import analyze_documents

    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in _LANG_SAMPLES],
            "doc_id long, text string")
        out = analyze_documents(df)
        # force full materialization of every output column (count()
        # would let Catalyst prune the expensive expressions away)
        assert out.agg(F.count("fp"), F.count("lang_pred"),
                       F.count("quality")).collect()[0][0] > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
