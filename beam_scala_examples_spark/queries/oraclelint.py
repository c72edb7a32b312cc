"""Oracle-determinism hardening (round 8).

Round 7's single correctness flake was a DuckDB double-evaluation of a
multi-referenced UNMATERIALIZED CTE: the windowed-islands ``rg`` CTE in
the winnow-coverage oracle fed two UNION legs un-materialized and one
run produced a physically impossible row (``docs/ROUND7_NOTES.md``).
The fix there was ``AS MATERIALIZED``; the audit found the same risk
SHAPE — a CTE that is (a) referenced more than once AND (b) contains a
window (``OVER (``) or UNION composition — in ~146 oracles that had
merely been empirically green.

This module closes the class mechanically instead of hand-editing 146
composed f-strings:

 - :func:`parse_ctes` — an exact scanner over the oracle's OUTERMOST
   ``WITH`` list (paren/quote aware, no regex guessing of spans);
 - :func:`at_risk_ctes` — the audit rule above;
 - :func:`materialize` — inserts ``MATERIALIZED`` at the recorded
   definition span for a verified-safe name list;
 - :func:`harden_oracles` — applies the committed, execution-verified
   per-oracle name lists (``oracle_materialize.json``, produced by
   ``tools/oracle_stability.py --emit``: each hardened oracle must run
   repeatedly AND hash-equal its unhardened form before it is listed —
   DuckDB rejects MATERIALIZED in a few compositions with an internal
   "Recursive CTE scan" error, so blind insertion is not safe).

The registry in ``queries/__init__.py`` applies :func:`harden_oracles`
at import, so the driver's correctness gate, the parity sweeps, and
``tools/oracle_stability.py --check`` all exercise the hardened SQL.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_RISK_BODY = re.compile(
    # OVER ( ... ) inline windows, OVER w named windows (the winnow
    # chain's `brk` uses `WINDOW w AS (...)` — round 9), and UNION legs
    r"\bOVER\s*\(|\bOVER\s+[A-Za-z_]|\bUNION\b",
    re.IGNORECASE,
)


@dataclass
class Cte:
    name: str
    name_start: int      # offset of the name token
    body_start: int      # offset of the opening '(' of the body
    body_end: int        # offset just past the closing ')'
    materialized: bool


def _skip_ws_and_comments(sql: str, i: int) -> int:
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in " \t\r\n":
            i += 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            break
    return i


def _scan_parens(sql: str, i: int) -> int:
    """``sql[i]`` is '('; return offset just past its matching ')'.
    Quote- and comment-aware (single quotes; doubled '' escapes)."""
    depth = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            i += 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c == "(":
            depth += 1
            i += 1
        elif c == ")":
            depth -= 1
            i += 1
            if depth == 0:
                return i
        else:
            i += 1
    raise ValueError("unbalanced parentheses in oracle SQL")


def parse_ctes(sql: str) -> tuple[list[Cte], int]:
    """Parse the OUTERMOST ``WITH name AS [MATERIALIZED] (...), ...``
    list.  Returns (ctes, main_query_start); ([], 0) when the statement
    does not lead with WITH.  Nested WITHs inside CTE bodies are left
    alone (their spans are inside a recorded body)."""
    i = _skip_ws_and_comments(sql, 0)
    m = _WORD.match(sql, i)
    if not m or m.group(0).upper() != "WITH":
        return [], 0
    i = m.end()
    out: list[Cte] = []
    while True:
        i = _skip_ws_and_comments(sql, i)
        m = _WORD.match(sql, i)
        if not m:
            raise ValueError(f"expected CTE name at offset {i}")
        name, name_start = m.group(0), i
        if name.upper() == "RECURSIVE" and not out:
            i = m.end()
            continue
        i = _skip_ws_and_comments(sql, m.end())
        if i < len(sql) and sql[i] == "(":  # optional (column list)
            i = _skip_ws_and_comments(sql, _scan_parens(sql, i))
        m = _WORD.match(sql, i)
        if not m or m.group(0).upper() != "AS":
            raise ValueError(f"expected AS after CTE {name!r}")
        i = _skip_ws_and_comments(sql, m.end())
        materialized = False
        m = _WORD.match(sql, i)
        if m and m.group(0).upper() == "NOT":
            i = _skip_ws_and_comments(sql, m.end())
            m = _WORD.match(sql, i)
            if not m or m.group(0).upper() != "MATERIALIZED":
                raise ValueError(f"expected MATERIALIZED after NOT in {name!r}")
            i = _skip_ws_and_comments(sql, m.end())
        elif m and m.group(0).upper() == "MATERIALIZED":
            materialized = True
            i = _skip_ws_and_comments(sql, m.end())
        if i >= len(sql) or sql[i] != "(":
            raise ValueError(f"expected ( for CTE {name!r} body")
        body_end = _scan_parens(sql, i)
        out.append(Cte(name, name_start, i, body_end, materialized))
        j = _skip_ws_and_comments(sql, body_end)
        if j < len(sql) and sql[j] == ",":
            i = j + 1
            continue
        return out, j


def _shadowed_spans(sql: str, name: str) -> list[tuple[int, int]]:
    """Spans of parenthesized subqueries whose own nested ``WITH`` list
    re-defines ``name`` — inside such a span every occurrence of the
    name refers to the SHADOWING inner CTE, not the outer one.  The
    house oracles compose by embedding whole oracle strings as
    ``FROM (WITH ... SELECT ...)`` / ``x AS (WITH ...)`` bodies, so
    without this masking a single-referenced outer CTE whose name also
    appears in an embedded oracle is misclassified as multi-referenced
    (round 8 found exactly that: ``fb`` in ``sim_prf_probe_sweep``,
    whose ``truth`` CTE embeds the ``sim_prf_expand`` oracle defining
    its own ``fb``)."""
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"\bWITH\b", sql, re.IGNORECASE):
        p = m.start()
        q = p - 1
        while q >= 0 and sql[q] in " \t\r\n":
            q -= 1
        if q < 0 or sql[q] != "(":
            continue  # the outermost WITH, or not a subquery head
        try:
            inner, _ = parse_ctes(sql[p:])
        except ValueError:
            continue
        if any(c.name == name for c in inner):
            spans.append((q, _scan_parens(sql, q)))
    return spans


def _ref_count(
    sql: str, cte: Cte, scope: tuple[int, int] = (0, -1)
) -> int:
    """Occurrences of the CTE name WITHIN ITS SCOPE, outside its own
    definition header and outside any deeper nested-WITH span that
    shadows it — i.e. true references from later same-scope CTE bodies
    and the scope's main query.  Word-boundary count; a column sharing
    the name still inflates the count (conservative: may flag, never
    hides a multi-reference)."""
    lo, hi = scope
    if hi < 0:
        hi = len(sql)
    chars = list(sql)
    for k in range(0, lo):
        chars[k] = " "
    for k in range(hi, len(sql)):
        chars[k] = " "
    spans = [(cte.name_start, cte.body_end)]
    # a shadow span containing this CTE's own definition is its defining
    # scope (or an ancestor wrapper) — not a shadow of it
    spans += [
        (slo, shi)
        for slo, shi in _shadowed_spans(sql, cte.name)
        if not (slo <= cte.name_start < shi)
    ]
    for slo, shi in spans:
        for k in range(slo, shi):
            chars[k] = " "
    masked = "".join(chars)
    return len(
        re.findall(rf"(?<![A-Za-z0-9_.]){re.escape(cte.name)}\b", masked)
    )


def _scopes(sql: str):
    """Yield ``(span_lo, span_hi, ctes)`` for every WITH scope in the
    statement — the outermost list (span = whole statement) and every
    nested ``(WITH ...)`` subquery — with ABSOLUTE Cte offsets.

    Round 9: the round-8 audit only parsed the outermost list, so an
    oracle that embeds another oracle as a subquery (the house
    composition idiom, e.g. ``text_winnow_coverage_by_source`` wrapping
    the whole ``text_winnow_coverage`` SQL inside its ``cov`` CTE) hid
    its inner multi-referenced windowed CTEs from the audit entirely —
    which is exactly where round 8's live flake lived."""
    ctes, _ = parse_ctes(sql)
    if ctes:
        yield 0, len(sql), ctes
    for m in re.finditer(r"\bWITH\b", sql, re.IGNORECASE):
        p = m.start()
        q = p - 1
        while q >= 0 and sql[q] in " \t\r\n":
            q -= 1
        if q < 0 or sql[q] != "(":
            continue  # the outermost WITH, or not a subquery head
        try:
            inner, _ = parse_ctes(sql[p:])
        except ValueError:
            continue
        if not inner:
            continue
        try:
            hi = _scan_parens(sql, q)
        except ValueError:
            continue
        yield q, hi, [
            Cte(
                c.name,
                c.name_start + p,
                c.body_start + p,
                c.body_end + p,
                c.materialized,
            )
            for c in inner
        ]


def _cte_refs(sql: str, ctes: list[Cte]) -> dict[str, set[str]]:
    """For each CTE of one scope, the set of EARLIER same-scope CTE
    names its body references (word-boundary, shadow-aware: an
    occurrence inside a DEEPER nested-WITH scope that re-defines the
    name is the inner CTE, not this one; a shadow span that CONTAINS
    the referenced CTE's own definition is its defining scope or an
    ancestor, not a shadow)."""
    refs: dict[str, set[str]] = {}
    for idx, c in enumerate(ctes):
        r: set[str] = set()
        for o in ctes[:idx]:
            shadow = [
                (lo, hi)
                for lo, hi in _shadowed_spans(sql, o.name)
                if not (lo <= o.name_start < hi)
            ]
            pat = re.compile(rf"(?<![A-Za-z0-9_.]){re.escape(o.name)}\b")
            for m in pat.finditer(sql, c.body_start, c.body_end):
                if any(lo <= m.start() < hi for lo, hi in shadow):
                    continue
                r.add(o.name)
                break
        refs[c.name] = r
    return refs


def _risky_closure(sql: str, ctes: list[Cte]) -> set[str]:
    """Names whose TRANSITIVE expansion carries a window or UNION.

    Round 9: the round-8 rule tested only a CTE's own body, but DuckDB
    inlines plain CTE chains — re-evaluating a multi-referenced CTE
    re-evaluates its un-materialized ancestors too, so a riskless body
    over a windowed ancestor is exactly as double-evaluable as the
    windowed body itself (round 8's live flake:
    ``text_winnow_coverage_by_source``'s ``mp``/``prints`` chain).
    Risk propagates consumer-ward only through UN-materialized
    ancestors — a MATERIALIZED ancestor evaluates once by definition."""
    risky = {
        c.name
        for c in ctes
        if _RISK_BODY.search(sql[c.body_start:c.body_end])
    }
    inline = {c.name for c in ctes if not c.materialized}
    refs = _cte_refs(sql, ctes)
    changed = True
    while changed:
        changed = False
        for c in ctes:
            if c.name in risky:
                continue
            if refs[c.name] & (risky & inline):
                risky.add(c.name)
                changed = True
    return risky


def at_risk_ctes(sql: str) -> list[str]:
    """Names of un-materialized CTEs — in ANY scope, outermost or
    nested — that are multi-referenced within their scope AND whose
    transitive expansion (own body, or any un-materialized same-scope
    ancestor CTE it references, recursively) carries a window or UNION
    composition.

    Round 7 established the base shape (multi-referenced windowed CTE
    double-evaluated by DuckDB); round 8's live flake
    (``text_winnow_coverage_by_source``) showed two gaps this closes:
    risk is TRANSITIVE over the CTE dependency graph (DuckDB inlines
    plain CTE chains, so a riskless body over a windowed ancestor
    re-evaluates the window at each reference), and composition hides
    chains in NESTED ``(WITH ...)`` scopes the outer-only parse never
    audited."""
    out: list[str] = []
    seen: set[str] = set()
    for lo, hi, ctes in _scopes(sql):
        risky = _risky_closure(sql, ctes)
        for c in ctes:
            if c.materialized or c.name in seen:
                continue
            if c.name not in risky:
                continue
            if _ref_count(sql, c, (lo, hi)) >= 2:
                out.append(c.name)
                seen.add(c.name)
    return out


def all_unmaterialized_cte_names(sql: str) -> set[str]:
    """Every un-materialized CTE name across all scopes — the stale-list
    domain for ``tools/oracle_stability.py --check`` and the registry
    invariant test."""
    return {
        c.name
        for _, _, ctes in _scopes(sql)
        for c in ctes
        if not c.materialized
    }


def materialize(sql: str, names: list[str] | set[str]) -> str:
    """Insert ``MATERIALIZED`` into the definitions of ``names`` — in
    EVERY scope that defines them (round 9: nested-scope definitions
    are where the live flake's CTEs live; a name colliding across
    scopes gets each definition materialized, which --emit's
    hash-equality verification vouches for).  Names that are absent or
    already materialized are skipped (the stability tool's --check mode
    reports stale lists)."""
    want = set(names)
    inserts = {
        c.body_start
        for _, _, ctes in _scopes(sql)
        for c in ctes
        if c.name in want and not c.materialized
    }
    for pos in sorted(inserts, reverse=True):
        sql = sql[:pos] + "MATERIALIZED " + sql[pos:]
    return sql


_DATA_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "oracle_materialize.json"
)


def load_materialize_lists() -> dict[str, list[str]]:
    if not os.path.exists(_DATA_PATH):
        return {}
    with open(_DATA_PATH) as f:
        return json.load(f)


def harden_oracles(oracle: dict[str, str]) -> dict[str, str]:
    """Apply the committed, execution-verified materialization lists."""
    lists = load_materialize_lists()
    return {
        name: materialize(sql, lists[name]) if name in lists else sql
        for name, sql in oracle.items()
    }


# At-risk CTEs where materialization FAILED execution-verification
# (tools/oracle_stability.py --emit rejected them: DuckDB errors on
# MATERIALIZED in the composition, or the hardened result hash-diverged)
# — documented residuals, not silent gaps.  A name here is still
# monitored by --check's repeat-run stability sweep.
#
# Round 8 closed the one entry this table ever held:
# sim_prf_probe_sweep's `fb` was a SCANNER false positive — its
# "second reference" was the shadowed `fb` defined inside the embedded
# sim_prf_expand oracle in `truth`'s body; with shadow-aware ref
# counting (_shadowed_spans) it is single-referenced, hence not
# double-evaluable, hence not at risk.  (Materializing it still
# triggers a DuckDB internal error — "Recursive CTE scan found without
# recursive CTE node" — but that is now moot.)
#
# Round 9 (nested-scope audit): sim_prf_probe_sweep's `qcent` is
# defined BOTH at the outer scope and inside the embedded
# sim_prf_expand oracle (`truth`'s nested WITH); materializing both
# definitions trips DuckDB's "Duplicate alias \"qcent\" in query"
# binder error, so --emit rejected it.  Residual risk is bounded: the
# outer `qcent` is a windowless mean over a bounded query set, and the
# parity harness's fresh-connection retry adjudicates any remaining
# oracle-side instability (tests/oracle_harness.compare).
VERIFY_REJECTED: dict[str, list[str]] = {
    "sim_prf_probe_sweep": ["qcent"],
}
