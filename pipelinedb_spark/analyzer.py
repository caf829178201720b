"""Continuous-query analyzer: validate the CQ SQL subset and split a
``SELECT`` over a stream into (worker partial-agg plan, matrel schema,
overlay finalize plan).

Mirrors the behavior (not the implementation) of the reference's
``TransformSelectStmtForContProcess`` (``src/analyzer.c:2762-3074``),
``ValidateParsedContQuery`` (``src/analyzer.c:1183-1336``) and the
streaming-variant rewrite table (``src/analyzer.c:84-107``).  The
reference manipulates raw Postgres parse trees; here we do a light
clause-level parse and hand every scalar expression through to Spark SQL
untouched — Catalyst is the real expression compiler.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pipelinedb_spark.aggregates import REGISTRY, AggRegistry


class CQError(ValueError):
    """Continuous-query validation error (reference: ereport calls in
    ValidateParsedContQuery)."""


# ---------------------------------------------------------------------------
# Tokenizer helpers: find top-level occurrences (outside parens/quotes)
# ---------------------------------------------------------------------------

def _scan(sql: str):
    """Yield (index, char, depth, in_string) for top-level scanning."""
    depth = 0
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == '"':
            j = sql.find('"', i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        yield i, c, depth
        i += 1


def split_top_level(sql: str, sep: str = ",") -> list[str]:
    parts, last = [], 0
    for i, c, depth in _scan(sql):
        if c == sep and depth == 0:
            parts.append(sql[last:i])
            last = i + 1
    parts.append(sql[last:])
    return [p.strip() for p in parts if p.strip()]


def find_keyword(sql: str, kw: str) -> int:
    """Index of a top-level keyword (case-insensitive, word-bounded); -1.
    One _scan pass builds the set of top-level (outside parens/strings)
    positions; matches are checked against it — O(n + matches)."""
    pat = re.compile(r"\b" + kw.replace(" ", r"\s+") + r"\b", re.I)
    top = {i for i, _, d in _scan(sql) if d == 0}
    for m in pat.finditer(sql):
        if m.start() in top:
            return m.start()
    return -1


_CLAUSES = ["SELECT", "FROM", "WHERE", "GROUP BY", "HAVING",
            "ORDER BY", "LIMIT", "OFFSET"]


def split_clauses(sql: str) -> dict[str, str]:
    sql = sql.strip().rstrip(";")
    positions = []
    for kw in _CLAUSES:
        idx = find_keyword(sql, kw)
        if idx >= 0:
            positions.append((idx, kw))
    positions.sort()
    out: dict[str, str] = {}
    for j, (idx, kw) in enumerate(positions):
        end = positions[j + 1][0] if j + 1 < len(positions) else len(sql)
        out[kw] = sql[idx + len(kw): end].strip()
    return out


# ---------------------------------------------------------------------------
# Aggregate extraction
# ---------------------------------------------------------------------------

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")

# names users may not alias outputs to: the stream's implicit arrival
# column plus this engine's internal matrel columns
_RESERVED_COLS = {"arrival_timestamp", "_step", "_gid", "_seq",
                  "__bucket"}

# Non-combinable → streaming variant rewrites (reference
# StreamingVariants, src/analyzer.c:84-107).
STREAMING_VARIANTS = {
    "percentile_cont": "combinable_percentile_cont",
    "rank": "combinable_rank",
    "dense_rank": "combinable_dense_rank",
    "percent_rank": "combinable_percent_rank",
    "cume_dist": "combinable_cume_dist",
}


_LITERAL_ARG_RE = re.compile(
    r"^\s*(?:[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|'(?:[^']|'')*'|\*)\s*$")


@dataclass
class AggCall:
    out: str            # output/state column prefix
    func: str           # registry name
    args: list[str]     # raw SQL arg expressions
    text: str           # original call text (for error messages)
    # FILTER (WHERE ...) condition — applied WORKER-side only; the
    # combiner merges unfiltered states exactly as the reference strips
    # the clause from combiner aggs (src/analyzer.c:3053-3068)
    filter: str | None = None

    def worker_args(self) -> list[str]:
        """Args for the worker's partial aggregation, with the FILTER
        condition folded in.  Every registry aggregate is NULL-strict
        (built-ins skip NULL inputs; sketch UDAFs dropna), so
        ``FILTER (WHERE c)`` ≡ nulling out the data args on non-
        matching rows — PG's row-removal semantics.  Literal/parameter
        args (numbers, strings, ``*``) are left untouched: they are
        direct arguments, not per-row inputs."""
        if self.filter is None:
            return self.args
        cond = f"({self.filter})"
        wrapped, any_data = [], False
        for a in self.args:
            if _LITERAL_ARG_RE.match(a):
                wrapped.append(a)
            else:
                wrapped.append(f"CASE WHEN {cond} THEN ({a}) END")
                any_data = True
        if not any_data:
            if self.func == "count":
                # count(*) FILTER (WHERE c) → count of matching rows
                return [f"CASE WHEN {cond} THEN 1 END"]
            raise CQError(
                f"FILTER is not supported here (no per-row argument "
                f"to restrict): {self.text}")
        return wrapped


@dataclass
class CQPlan:
    select_items: list[tuple[str, str]]        # (expr with placeholders, alias)
    aggs: list[AggCall]
    group_exprs: list[str]                     # raw SQL group expressions
    group_names: list[str]                     # matrel column name per group expr
    from_clause: str
    stream: str                                # the single stream read
    where: str | None
    limit: int | None
    distinct: bool
    sw_column: str | None = None               # sliding-window time column
    sw_seconds: float | None = None
    sw_step_seconds: float | None = None
    tables: list[str] = field(default_factory=list)
    # GROUPING SETS/CUBE/ROLLUP: list of sets (each a list of exprs from
    # group_exprs); None for plain GROUP BY (reference analyzer.c:2819)
    grouping_sets: list[list[str]] | None = None
    # DISTINCT ON (cols): overlay-level dedup on these columns
    # (reference: DISTINCT ON -> view-level distinct, analyzer.c:3019)
    distinct_on: list[str] | None = None
    # no-aggregate CV (reference create_cont_view.sql cqcreate0-2):
    # every projected event row materializes.  State is count-compressed
    # (one matrel row per distinct projected tuple + multiplicity);
    # reads expand the multiset back.
    append: bool = False
    # LIMIT ... OFFSET n (reference cont_limit.sql): the overlay skips
    # the first n rows in ARRIVAL order for append CVs
    offset: int | None = None


def _find_call_end(sql: str, open_idx: int) -> int:
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n and not (sql[j] == "'" and (j + 1 >= n or sql[j + 1] != "'")):
                j += 2 if sql[j] == "'" else 1
            i = j
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise CQError(f"unbalanced parentheses in: {sql!r}")


def _fold_within_group(expr: str) -> str:
    """``fn(a) WITHIN GROUP (ORDER BY x [, y])`` → ``fn(a, x[, y])``
    (reference folds WITHIN GROUP args into plain args,
    src/analyzer.c:2091-2108)."""
    pat = re.compile(r"\)\s*WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+", re.I)
    while True:
        m = pat.search(expr)
        if not m:
            return expr
        close = expr.find(")", m.end())
        depth = 1
        i = m.end()
        while i < len(expr):
            if expr[i] == "(":
                depth += 1
            elif expr[i] == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
            i += 1
        order_args = expr[m.end():close]
        expr = expr[: m.start()] + ", " + order_args + ")" + expr[close + 1:]


def extract_aggs(expr: str, registry: AggRegistry, used: set[str],
                 alias_hint: str | None = None) -> tuple[str, list[AggCall]]:
    """Replace aggregate calls in ``expr`` with ``{placeholder}`` refs,
    returning the rewritten expression and the extracted calls.  This is
    the hoisting step (reference src/analyzer.c:2880-3008)."""
    expr = _fold_within_group(expr)
    calls: list[AggCall] = []
    out_parts: list[str] = []
    i = 0
    n = len(expr)
    while i < n:
        m = _IDENT_RE.match(expr, i)
        if not m:
            out_parts.append(expr[i])
            i += 1
            continue
        word = m.group(0)
        j = m.end()
        while j < n and expr[j].isspace():
            j += 1
        fname = word.lower()
        if j < n and expr[j] == "(" and (fname in registry or fname in STREAMING_VARIANTS or fname == "count"):
            close = _find_call_end(expr, j)
            inner = expr[j + 1: close]
            args = split_top_level(inner) if inner.strip() else []
            func = fname
            # count(DISTINCT x) → streaming hll_count_distinct unless
            # it's an exact-friendly rewrite requested upstream
            if args and re.match(r"(?i)^DISTINCT\s+", args[0]):
                bare = re.sub(r"(?i)^DISTINCT\s+", "", args[0])
                if fname == "count":
                    func, args = "hll_count_distinct", [bare] + args[1:]
                elif fname == "array_agg":
                    func, args = "set_agg", [bare] + args[1:]
                else:
                    raise CQError(
                        f"DISTINCT is only supported by count/array_agg in "
                        f"continuous queries: {word}({inner})")
            func = STREAMING_VARIANTS.get(func, func)
            if func not in registry:
                raise CQError(f"aggregate {word} is not combinable / not supported")
            # agg(...) FILTER (WHERE cond) — reference parses the
            # clause on worker aggregates and strips it on combiner
            # aggs (src/analyzer.c:3053-3068; cont_dist_agg.sql:38)
            call_end, filt = close, None
            fm = re.compile(r"\s*FILTER\s*\(", re.I).match(expr, close + 1)
            if fm:
                fclose = _find_call_end(expr, fm.end() - 1)
                inner_f = expr[fm.end(): fclose].strip()
                wm = re.match(r"(?i)^WHERE\s+", inner_f)
                if not wm:
                    raise CQError(f"malformed FILTER clause in: "
                                  f"{expr[m.start():fclose + 1]}")
                filt = inner_f[wm.end():].strip()
                call_end = fclose
            base = alias_hint if (alias_hint and not calls and expr.strip() == expr[m.start():call_end + 1].strip()) else fname
            out = base
            k = 0
            while out in used:
                k += 1
                out = f"{base}_{k}"
            used.add(out)
            calls.append(AggCall(out=out, func=func, args=args,
                                 text=expr[m.start():call_end + 1],
                                 filter=filt))
            out_parts.append("{" + out + "}")
            i = call_end + 1
        else:
            out_parts.append(word)
            i = m.end()
    return "".join(out_parts), calls


# ---------------------------------------------------------------------------
# Sliding-window detection
# ---------------------------------------------------------------------------

_INTERVAL_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800, "ms": 0.001, "millisecond": 0.001,
    "milliseconds": 0.001,
}


def parse_interval(text: str) -> float:
    """'5 minutes' / '1 hour 30 minutes' → seconds."""
    total = 0.0
    for num, unit in re.findall(r"([\d.]+)\s*([A-Za-z]+)", text):
        u = unit.lower()
        if u not in _INTERVAL_UNITS:
            raise CQError(f"unsupported interval unit: {unit!r}")
        total += float(num) * _INTERVAL_UNITS[u]
    if total <= 0:
        raise CQError(f"cannot parse interval: {text!r}")
    return total


_SW_RE = re.compile(
    # a bare timestamp column OR one function call over it, e.g.
    # minute_trunc(arrival_timestamp) (reference resolves whole
    # arrival_timestamp expressions, find_clock_timestamp_expr,
    # src/analyzer.c:321-423), optionally with a constant interval
    # offset on the LHS: ``expr + interval 'K' > clock_timestamp() -
    # interval 'W'`` normalizes to ``expr > clock_timestamp() -
    # (W + K)`` (reference sw_ts_expr1, pipeline_regress.sql:183-185)
    r"(?P<col>[A-Za-z_][\w.]*(?:\s*\(\s*[A-Za-z_][\w.]*\s*\))?)"
    r"(?:\s*(?P<offsign>[+-])\s*interval\s*'(?P<off>[^']+)')?"
    r"\s*>=?\s*\(?\s*"
    r"(?:clock_timestamp|now|current_timestamp)\s*\(\s*\)\s*-\s*"
    r"interval\s*'(?P<iv>[^']+)'\s*\)?", re.I)


def split_conjuncts(where: str) -> list[str]:
    """Split a WHERE clause into top-level AND conjuncts (paren- and
    string-literal-aware)."""
    top = {i for i, _, d in _scan(where) if d == 0}
    parts, last = [], 0
    for m in re.finditer(r"(?i)\bAND\b", where):
        # positions inside strings/parens are absent from `top`
        if m.start() in top:
            parts.append(where[last:m.start()])
            last = m.end()
    parts.append(where[last:])
    return [p.strip() for p in parts if p.strip()]


def detect_sliding_window(where: str | None) -> tuple[str | None, float | None, str | None]:
    """Find ``ts > clock_timestamp() - interval 'X'`` in WHERE; return
    (column, seconds, remaining_where).  The matching conjunct is
    removed whole — mid-conjunction predicates splice cleanly
    (reference removes the matched parse-tree node,
    find_clock_timestamp_expr src/analyzer.c:321-423)."""
    if not where:
        return None, None, where
    if not _SW_RE.search(where):
        return None, None, where
    col = secs = None
    rest_parts = []
    for conj in split_conjuncts(where):
        m = _SW_RE.search(conj)
        if m is not None and col is None:
            col = m.group("col")
            secs = parse_interval(m.group("iv"))
            if m.group("off"):
                # LHS interval offset folds into the window width:
                # expr + K > clock() - W  ⟺  expr > clock() - (W + K)
                k = parse_interval(m.group("off"))
                secs = secs + k if m.group("offsign") == "+" else secs - k
                if secs <= 0:
                    raise CQError(
                        "sliding-window offset leaves a non-positive "
                        f"window ({secs}s)")
        else:
            rest_parts.append(conj)
    rest = " AND ".join(rest_parts).strip()
    return col, secs, (rest or None)


# ---------------------------------------------------------------------------
# Sub-SELECT validation (reference ValidateSubselect,
# src/analyzer.c:1344-1407): inner queries of a CQ's FROM clause must be
# simple projections — the continuous semantics of aggregates/DISTINCT/
# ORDER BY etc. inside a subquery would silently differ from batch SQL.
# ---------------------------------------------------------------------------

_SUBSELECT_AGGS = {"count", "sum", "avg", "min", "max", "stddev",
                   "variance", "var_samp", "var_pop", "stddev_samp",
                   "stddev_pop", "array_agg", "string_agg", "json_agg",
                   "collect_list", "collect_set", "first", "last"}


def _validate_subselects(from_clause: str, registry: AggRegistry) -> None:
    desc = "subqueries in continuous views"
    for m in re.finditer(r"(?i)\(\s*(SELECT|WITH)\b", from_clause):
        # extract the balanced-paren inner text (string-aware)
        start = m.start()
        end = None
        for i, c, d in _scan(from_clause[start:]):
            if c == ")" and d == 0:
                end = start + i
                break
        inner = from_clause[start + 1: end] if end else from_clause[start + 1:]
        if re.match(r"(?i)^\s*WITH\b", inner):
            raise CQError(f"{desc} cannot contain CTEs")
        sub = split_clauses(inner)
        for kw, what in [("GROUP BY", "GROUP BY clauses"),
                         ("HAVING", "HAVING clauses"),
                         ("ORDER BY", "ORDER BY clauses"),
                         ("LIMIT", "LIMIT clauses"),
                         ("OFFSET", "OFFSET clauses")]:
            if kw in sub:
                raise CQError(f"{desc} cannot contain {what}")
        if re.match(r"(?i)^\s*DISTINCT\b", sub.get("SELECT", "")):
            raise CQError(f"{desc} cannot contain DISTINCT clauses")
        if re.search(r"(?i)\bOVER\s*\(", inner):
            raise CQError(f"{desc} cannot contain window functions")
        if re.search(r"(?i)\bFOR\s+UPDATE\b", inner):
            raise CQError(f"{desc} cannot contain FOR UPDATE clauses")
        for fname in re.findall(r"([A-Za-z_]\w*)\s*\(", inner):
            f = fname.lower()
            if f in _SUBSELECT_AGGS or f in registry:
                raise CQError(f"{desc} cannot contain aggregates")


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------

_DATEPART_BARE = re.compile(
    r"(?i)\b(year|month|day|hour|minute|second)(\s*\()")


def rewrite_datepart_truncs(sql: str) -> str:
    """Reference parity for bare datepart calls INSIDE CQ SQL:
    PipelineDB registers ``year()/month()/day()/hour()/minute()/
    second()`` as timestamp TRUNCATION functions
    (pipelinedb--1.0.0.sql:2590-2618, src/miscutils.c:562-618), while
    Spark's builtins of the same names EXTRACT an integer field.  A CQ
    written for the reference means truncation, so bare calls rewrite
    to the registered ``*_trunc`` equivalents — CQ SQL only; the
    ad-hoc ``ctx.sql()`` surface keeps Spark semantics (use
    ``extract(minute FROM ts)`` / ``date_part`` in a CQ for the
    extraction meaning).  String/quoted regions are skipped."""
    # _scan only yields positions OUTSIDE string/quoted regions
    outside = {i for i, _c, _d in _scan(sql)}
    out, last = [], 0
    for m in _DATEPART_BARE.finditer(sql):
        if m.start() not in outside:
            continue  # inside a string literal / quoted identifier
        out.append(sql[last:m.start()])
        out.append(m.group(1).lower() + "_trunc" + m.group(2))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def analyze(sql: str, stream_names: set[str], registry: AggRegistry = REGISTRY,
            sw: str | None = None, step_factor: float = 5.0) -> CQPlan:
    # PostgreSQL composite field access over change rows — `(delta).n`,
    # `(new).x`, `(old).x` (reference delta_streams.sql) — normalizes
    # to Spark struct access `delta.n`
    sql = re.sub(r"\(\s*(old|new|delta)\s*\)\s*\.", r"\1.", sql)
    clauses = split_clauses(sql)
    if "SELECT" not in clauses or "FROM" not in clauses:
        raise CQError("continuous queries must be SELECT ... FROM ...")
    if "HAVING" in clauses:
        raise CQError("continuous queries don't support HAVING clauses; "
                      "use a WHERE clause on the continuous view instead")
    if "ORDER BY" in clauses:
        raise CQError("continuous queries don't support ORDER BY")
    if re.match(r"(?i)^\s*WITH\b", sql.strip()):
        raise CQError("continuous queries don't support CTEs")
    if re.search(r"(?i)\bOVER\s*\(", sql):
        raise CQError("continuous queries don't support window functions")

    select_text = clauses["SELECT"]
    distinct = False
    distinct_on: list[str] | None = None
    m_don = re.match(r"(?i)^DISTINCT\s+ON\s*\(", select_text)
    if m_don:
        close = select_text.find(")", m_don.end())
        depth = 1
        i = m_don.end()
        while i < len(select_text):
            if select_text[i] == "(":
                depth += 1
            elif select_text[i] == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
            i += 1
        distinct_on = split_top_level(select_text[m_don.end():close])
        select_text = select_text[close + 1:].strip()
        distinct = True
    elif re.match(r"(?i)^DISTINCT\b", select_text):
        distinct = True
        select_text = re.sub(r"(?i)^DISTINCT\s+", "", select_text)
    if re.search(r"(^|[\s,(])\*\s*(,|$)", select_text.strip()) and select_text.strip() == "*":
        raise CQError("can't select \"*\" in continuous queries")

    from_clause = clauses["FROM"]
    _validate_subselects(from_clause, registry)
    # identify relations named in FROM (stream + tables)
    rel_tokens = re.findall(r"[A-Za-z_][\w.]*", from_clause)
    streams_in_from = [t for t in rel_tokens if t in stream_names]
    uniq_streams = list(dict.fromkeys(streams_in_from))
    if len(uniq_streams) == 0:
        raise CQError("continuous queries must include a stream in the FROM clause")
    if len(uniq_streams) > 1:
        raise CQError("continuous queries don't support stream-to-stream JOINs")
    stream = uniq_streams[0]

    where = clauses.get("WHERE")
    sw_col, sw_secs, where = detect_sliding_window(where)
    if sw:  # WITH (sw='X') storage option (reference analyzer.c:1771-)
        if sw_col:
            raise CQError("sw option conflicts with sliding-window WHERE predicate")
        sw_col, sw_secs = "arrival_timestamp", parse_interval(sw)

    limit = None
    if "LIMIT" in clauses:
        limit = int(clauses["LIMIT"].split()[0])
    offset = None
    if "OFFSET" in clauses:
        offset = int(clauses["OFFSET"].split()[0])

    # select items + aliases
    items = split_top_level(select_text)
    used: set[str] = set()
    parsed_items: list[tuple[str, str]] = []
    all_aggs: list[AggCall] = []
    raw_items: list[tuple[str, str]] = []
    for idx, item in enumerate(items):
        m = re.search(r"(?i)\s+AS\s+(" + _IDENT_RE.pattern + r"|\"[^\"]+\")\s*$", item)
        if m:
            alias = m.group(1).strip('"')
            body = item[: m.start()].strip()
        else:
            body = item.strip()
            alias = body if _IDENT_RE.fullmatch(body) else None
        if alias and alias.lower() in _RESERVED_COLS \
                and body.lower() != alias.lower():
            # renaming an output to an internal/reserved name corrupts
            # the matrel (reference: 'arrival_timestamp is a reserved
            # column name', create_cont_view.out:694)
            raise CQError(f"{alias} is a reserved column name")
        raw_items.append((body, alias))

    group_exprs = []
    grouping_sets: list[list[str]] | None = None
    if "GROUP BY" in clauses:
        gb_text = clauses["GROUP BY"].strip()
        m_gs = re.match(r"(?i)^(GROUPING\s+SETS|CUBE|ROLLUP)\s*\((.*)\)\s*$",
                        gb_text, re.S)
        if m_gs:
            kind = re.sub(r"\s+", " ", m_gs.group(1).upper())
            inner = m_gs.group(2)
            if kind == "GROUPING SETS":
                grouping_sets = []
                for part in split_top_level(inner):
                    part = part.strip()
                    if part.startswith("(") and part.endswith(")"):
                        part = part[1:-1]
                    grouping_sets.append(
                        [p for p in split_top_level(part) if p] if part.strip()
                        else [])
            else:
                base = split_top_level(inner)
                if kind == "CUBE":
                    from itertools import combinations
                    grouping_sets = [list(c) for r in range(len(base), -1, -1)
                                     for c in combinations(base, r)]
                else:  # ROLLUP
                    grouping_sets = [base[:i] for i in range(len(base), -1, -1)]
            seen_g: list[str] = []
            for gset in grouping_sets:
                for g in gset:
                    if g not in seen_g:
                        seen_g.append(g)
            group_exprs = seen_g
        else:
            group_exprs = split_top_level(gb_text)

    if distinct:
        if group_exprs:
            raise CQError("SELECT DISTINCT with GROUP BY is not supported")
        group_exprs = [b for b, _ in raw_items]

    # resolve GROUP BY ordinals / aliases to expressions
    def resolve_g(g: str) -> str:
        if g.isdigit():
            return raw_items[int(g) - 1][0]
        hit = next((b for b, a in raw_items if a == g and b != g), None)
        return hit if hit is not None else g

    group_exprs = [resolve_g(g) for g in group_exprs]
    if grouping_sets is not None:
        grouping_sets = [[resolve_g(g) for g in s] for s in grouping_sets]

    # hoist aggregates from each select item (two passes: the append-CV
    # decision needs to know whether ANY item aggregates)
    extracted = [(body, alias) + extract_aggs(body, registry, used,
                                              alias_hint=alias)
                 for body, alias in raw_items]
    append = (not any(calls for *_, calls in extracted)
              and not group_exprs and not distinct
              and grouping_sets is None)
    if append:
        # no aggregates anywhere: every projected event row
        # materializes (reference create_cont_view.sql cqcreate0-2).
        # All items become the matrel key; multiplicity rides a hidden
        # presence count, expanded back at read.
        group_exprs = [b for b, _ in raw_items]
    norm_group = {re.sub(r"\s+", "", g).lower() for g in group_exprs}
    for body, alias, rewritten, calls in extracted:
        if calls:
            all_aggs.extend(calls)
            name = alias or calls[0].out
        else:
            if (re.sub(r"\s+", "", body).lower() not in norm_group
                    and not distinct):
                raise CQError(
                    f"column {body!r} must appear in the GROUP BY clause or "
                    f"be used in an aggregate function")
            name = alias or re.sub(r"\W+", "_", body).strip("_")
        parsed_items.append((rewritten, name))

    # matrel names for group exprs: reuse select alias when the group
    # expr textually matches a plain select item, else hidden _gN
    # (INTERNAL_COLNAME_PREFIX, reference src/analyzer.c:64).
    group_names = []
    for i, g in enumerate(group_exprs):
        gnorm = re.sub(r"\s+", "", g).lower()
        hit = None
        for (body, alias), (rew, name) in zip(raw_items, parsed_items):
            if re.sub(r"\s+", "", body).lower() == gnorm and "{" not in rew:
                hit = name
                break
        if hit is None and _IDENT_RE.fullmatch(g.strip()) \
                and g.strip() not in used:
            # a bare-identifier group expr keeps its own name even
            # without a matching plain select item, so select
            # expressions MIXING it with aggregates (e.g.
            # id + avg(id), reference pipeline_regress.sql:68-71)
            # resolve against the matrel
            hit = g.strip()
        group_names.append(hit if hit else f"_g{i}")

    step = None
    if sw_col is not None:
        if not group_exprs and not all_aggs:
            raise CQError("sliding windows require aggregation")
        step = max(1.0, sw_secs * step_factor / 100.0)

    tables = [t for t in dict.fromkeys(rel_tokens)
              if t not in stream_names and t.upper() not in
              ("JOIN", "ON", "LEFT", "RIGHT", "INNER", "OUTER", "FULL",
               "CROSS", "AS", "AND", "OR", "USING")]

    return CQPlan(
        select_items=parsed_items,
        aggs=all_aggs,
        group_exprs=group_exprs,
        group_names=group_names,
        from_clause=from_clause,
        stream=stream,
        where=where,
        limit=limit,
        distinct=distinct,
        sw_column=sw_col,
        sw_seconds=sw_secs,
        sw_step_seconds=step,
        tables=tables,
        grouping_sets=grouping_sets,
        distinct_on=distinct_on,
        append=append,
        offset=offset,
    )
