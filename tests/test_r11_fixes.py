"""Round-11 fixes, each with its own regression:

* Gopher dup-fraction boundary rounding (ADVICE round 10) — the
  engine computed ``1.0 - distinct/n`` in doubles while the driver
  oracle evaluates the threshold in exact integer arithmetic; at a
  doc with EXACTLY 30% duplicate lines (10 lines, 7 distinct) the
  ``1 - x`` form rounds 1 ulp HIGH (0.30000000000000004 > 0.30) and
  the flag flips False while the oracle says True.  Both the Arrow
  kernel and the Catalyst-HOF fold now compute ``(n - d) / n`` —
  the single division rounds to the same double as the threshold
  literal, so flag comparisons agree with the oracle.
* Stolen-lock head re-read (ADVICE round 10) — in rename-mode
  post-write verification an OSError re-reading the head was treated
  like a clobber (`continue`), letting the retry RENAME the committed
  dir while the live manifest may still reference its current name.
  Transient errors now retry the single-pointer-file read in place;
  persistent unreadability raises CommitOutcomeUnknown and the dir is
  deliberately NOT shelved (either rename could dangle a live dirs
  entry).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------- gopher boundary docs round like the exact oracle

# exactly-at-threshold docs for the two "1 - x"-form metrics:
#   dup_line_frac  == 0.30  (10 lines, 7 distinct)
#   dup_word_frac  == 0.30  (10 words, 7 distinct — not a GOPHER rule
#                            threshold but same formula fix)
_BOUNDARY_LINES = "\n".join(
    ["a", "a", "b", "b", "c", "c", "d", "e", "f", "g"])
_BOUNDARY_WORDS = "aa aa bb bb cc cc dd ee ff gg"


def test_dup_line_frac_boundary_flag_matches_exact_arithmetic(spark):
    """10 lines / 7 distinct = exactly 3/10: the integer-arithmetic
    oracle ((ln_n - ln_d) * 10 <= 3 * ln_n) says PASS; the engine
    flag must agree on both metric paths."""
    from pipelinedb_spark.operators.quality import (GOPHER_RULES,
                                                    quality_flags)

    df = spark.createDataFrame([(1, _BOUNDARY_LINES)],
                               "doc_id long, text string")
    # kernel path (built-in rule rides the shared metrics pass)
    row = quality_flags(
        df, rules={"dup_line_frac": GOPHER_RULES["dup_line_frac"]}
    ).collect()[0]
    assert row["ok_dup_line_frac"] is True
    # integer-arithmetic ground truth, as the duckdb oracle states it
    ln_n, ln_d = 10, 7
    assert ((ln_n - ln_d) * 10 <= 3 * ln_n) is True


def test_dup_fraction_formula_exact_at_boundary(spark):
    """Both metric implementations (Arrow kernel and Column fold)
    produce a double that compares <= 0.30 at the exact boundary."""
    from pipelinedb_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, _BOUNDARY_LINES), (2, _BOUNDARY_WORDS)],
        "doc_id long, text string")
    # Column-fold path
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        Q.duplicate_line_fraction(F.col("text")).alias("lf"),
        Q.duplicate_word_fraction(F.col("text")).alias("wf"),
    ).collect()}
    assert got[1]["lf"] <= 0.30
    assert got[2]["wf"] <= 0.30
    # Arrow kernel path
    prof = {r["doc_id"]: r
            for r in Q.repetition_profile(df).collect()}
    assert prof[1]["dup_line_frac"] <= 0.30
    assert prof[2]["dup_word_frac"] <= 0.30
    # and the value is the correctly-rounded 3/10 on every path
    for v in (got[1]["lf"], got[2]["wf"],
              prof[1]["dup_line_frac"], prof[2]["dup_word_frac"]):
        assert v == 3 / 10


# ---------------- stolen-lock head re-read (rename mode)


def _mk_add(store, content, **kw):
    staged = store.stage()
    os.makedirs(staged)
    with open(os.path.join(staged, "f.txt"), "w") as f:
        f.write(content)
    return store.commit(staged, replace=False, **kw)


def _steal_after_write(RenameManifestIO, lockpath, state):
    orig_write = RenameManifestIO.write

    def write_then_steal(self, m, base_seq):
        orig_write(self, m, base_seq)
        if state["armed"] and self.path.endswith("_manifest.json"):
            state["armed"] = False
            with open(lockpath, "w") as f:
                f.write("thief-token")

    return orig_write, write_then_steal


def test_steal_with_transient_head_oserror_retries_in_place(
        tmp_path, monkeypatch):
    """A transient OSError re-reading the head after a stolen-lock
    write must RETRY the read, not renumber: the write survived, so
    the commit stands as-is (no second rename, no double meta fold)."""
    from pipelinedb_spark.indexstore import IndexStore
    from pipelinedb_spark.manifestio import RenameManifestIO

    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="rename")
    s.init_if_needed(meta={"cnt": 0})
    lockpath = os.path.join(root, "_commit.lock")

    state = {"armed": True}
    orig_write, write_then_steal = _steal_after_write(
        RenameManifestIO, lockpath, state)
    monkeypatch.setattr(RenameManifestIO, "write", write_then_steal)

    orig_read = RenameManifestIO.read_versioned
    fail = {"n": 2}  # first two re-reads fail, third succeeds

    def flaky_read(self):
        # only flake AFTER the steal armed (post-write verification);
        # the pre-write read inside the critical section stays real
        if not state["armed"] and fail["n"] > 0:
            fail["n"] -= 1
            raise OSError("transient: pointer file busy")
        return orig_read(self)

    monkeypatch.setattr(RenameManifestIO, "read_versioned", flaky_read)
    mine = _mk_add(s, "a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    monkeypatch.setattr(RenameManifestIO, "write", orig_write)
    monkeypatch.setattr(RenameManifestIO, "read_versioned", orig_read)
    os.remove(lockpath)

    m = s.read_manifest()
    assert m["dirs"] == [os.path.basename(mine)]
    assert m["meta"]["cnt"] == 1        # no refold
    assert m["version"] == 1            # no second commit
    assert fail["n"] == 0               # the retries actually ran
    assert os.path.isdir(mine)          # never renamed away


def test_steal_with_persistent_head_oserror_leaves_dir_in_place(
        tmp_path, monkeypatch):
    """When the head stays unreadable through every retry the outcome
    is UNKNOWN: CommitOutcomeUnknown propagates, and the committed dir
    keeps its v-name — neither renumbered nor shelved — because the
    live manifest may reference it (it does, in this interleaving)."""
    from pipelinedb_spark.indexstore import (CommitOutcomeUnknown,
                                             IndexStore)
    from pipelinedb_spark.manifestio import RenameManifestIO

    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="rename")
    s.init_if_needed(meta={"cnt": 0})
    lockpath = os.path.join(root, "_commit.lock")

    state = {"armed": True}
    orig_write, write_then_steal = _steal_after_write(
        RenameManifestIO, lockpath, state)
    monkeypatch.setattr(RenameManifestIO, "write", write_then_steal)

    orig_read = RenameManifestIO.read_versioned

    def broken_read(self):
        if not state["armed"]:
            raise OSError("persistent: pointer unreadable")
        return orig_read(self)

    monkeypatch.setattr(RenameManifestIO, "read_versioned", broken_read)
    with pytest.raises(CommitOutcomeUnknown):
        _mk_add(s, "a", meta_fn=lambda m: {**m, "cnt": m["cnt"] + 1})
    monkeypatch.setattr(RenameManifestIO, "write", orig_write)
    monkeypatch.setattr(RenameManifestIO, "read_versioned", orig_read)
    os.remove(lockpath)

    # the write DID land (this interleaving's head is our manifest) —
    # the referenced dir must still exist under its committed name
    m = s.read_manifest()
    assert len(m["dirs"]) == 1
    committed = os.path.join(root, m["dirs"][0])
    assert os.path.isdir(committed)     # no dangling dirs entry
    assert not [d for d in os.listdir(root)
                if d.startswith(".stage-conflict-")]  # not shelved
