"""SQL DML router: DELETE / UPDATE / MERGE INTO statements onto the
engine's row-level operations.

Iceberg exposes row-level DML as Spark SQL; this engine's write side is
a Python API (``delete_rows`` / ``update_where`` / ``merge_into``, the
read side already speaks SQL via ``Catalog.register_views``). The
router closes that gap for the three statements users actually type,
with a deliberately TINY grammar — everything it accepts maps 1:1 onto
an existing engine operation, and anything else raises
``UnsupportedSQL`` with the reason, instead of half-parsing:

  DELETE FROM t WHERE <tree>     -- tree = OR/AND (parens group) over
    col <op> literal | col IN (lit, ...) | col LIKE 'pfx%'   (round 14)
  DELETE FROM t WHERE col IN (<subquery> | literal[, ...])   -- MOR eq-delete
  UPDATE t SET col = <sql expr> [, ...] WHERE <tree>
  CREATE [OR REPLACE] VIEW v AS <select>    -- catalog view (versioned)
  DROP VIEW v
  MERGE INTO t [AS a] USING (<view name> | (<subquery>)) [AS b]
    ON a.k = b.k [AND a.k2 = b.k2]
    [WHEN MATCHED AND <cond> THEN DELETE]
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | col = <expr>[, ...]]
    [WHEN NOT MATCHED THEN INSERT *]
    [WHEN NOT MATCHED BY SOURCE THEN DELETE    -- full-sync mirror
     | WHEN NOT MATCHED BY SOURCE THEN UPDATE SET col = <t.* expr>[, ...]]
                                               -- flag-stale-rows (round 14)
  CREATE MATERIALIZED VIEW v AS
    SELECT k, COUNT(*) AS cnt, SUM(col) AS sv FROM t GROUP BY k
    (or several sums, each aliased sv_<col>)
  CREATE MATERIALIZED VIEW v AS               -- extrema fold (round 11)
    SELECT k, MIN(col) AS mn, MAX(col) AS mx FROM t GROUP BY k
  CREATE MATERIALIZED VIEW v AS               -- top-k fold
    SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
      ORDER BY c1[, c2...]) AS rn FROM t) WHERE rn <= N
  REFRESH MATERIALIZED VIEW v | REFRESH ALL MATERIALIZED VIEWS
  DROP MATERIALIZED VIEW v [PURGE]
  INSERT INTO t VALUES (lit, ...)[, (...)]  -- full-schema literal rows
  INSERT INTO t SELECT ... | WITH ...       -- append a query's rows
  INSERT INTO t (c1[, c2...]) VALUES ... | SELECT ...
    -- column-list insert: absent columns fill their initial default
    -- (a4d machinery) or NULL when nullable; refused otherwise
  INSERT OVERWRITE [TABLE] t VALUES ... | SELECT ...
    -- STATIC overwrite: whole content replaced in one atomic
    -- 'overwrite' snapshot
  INSERT OVERWRITE [TABLE] t PARTITION (k = v | k) VALUES|SELECT ...
    -- partition-scoped (round 12): (k = v) replaces exactly that
    -- identity partition (source omits k; empty source clears it);
    -- (k) is dynamic — replaces the partitions the rows touch
  INSERT OVERWRITE [TABLE] t PARTITION (k1 = v1, k2 = v2) ...
    -- composite STATIC form (round 14): the full tuple of an
    -- all-identity composite spec — exactly that tuple replaced,
    -- values fill the columns, empty source clears the tuple
  CREATE TABLE name AS SELECT ...           -- CTAS
  CREATE TABLE name (col type [NOT NULL] [DEFAULT lit], ...)
    [PARTITIONED BY (field [, field ...])]  -- bucket(N,c) | truncate(W,c) | years(c) | ... | c
    [TBLPROPERTIES ('k' = 'v'[, ...])]      -- plain DDL (round 11)
  OPTIMIZE t [WHERE pcol = lit]             -- full maintenance pass;
    -- WHERE scopes compaction to ONE identity partition (round 12);
    -- on a composite spec pcol may be any IDENTITY field — every
    -- tuple matching that field's value compacts (round 14)
  OPTIMIZE t ZORDER BY (c1[, c2, c3])       -- Morton layout rewrite
    -- (a3i machinery): per-file stats prune on EVERY named column
  VACUUM t [RETAIN n SNAPSHOTS]             -- snapshot expiry + GC
  ALTER TABLE t ADD COLUMN c type [DEFAULT lit] | RENAME COLUMN a TO b
    | ALTER COLUMN c TYPE type | DROP COLUMN c
    | SET TBLPROPERTIES ('k' = 'v'[, ...])
  DROP TABLE t [PURGE]
  TRUNCATE TABLE t                          -- metadata-only row wipe

DELETE/UPDATE WHERE clauses take general OR-of-conjunction trees over
``column <op> literal``, ``column IN (literals)``, and prefix
``column LIKE 'pfx%'`` (round 14): each leaf is stats-prunable, so the
planner prunes candidate files with the UNION of each OR-branch's
admissible set and rewrites with the full residual predicate — a
selective OR never rewrites the whole table. What stays refused, with
the reason: NOT (negation unbounds the prune), BETWEEN (spell as the
conjunction), non-prefix LIKE (no min/max mapping), IN (subquery)
inside a tree (the standalone form routes as a MOR equality delete).
OPTIMIZE ... WHERE keeps the tighter conjunction grammar — it must
name partitions, not rows. UPDATE's SET right-hand sides and MERGE's
clause conditions pass through as raw SQL — the underlying ops
evaluate them with Spark, so the full expression language works there.

No reference-engine counterpart: the reference defers all reads AND
row-level writes to Spark (Writer.java:143-145); this is the Spark-
facing surface an Iceberg user expects (Iceberg docs "Spark Writes").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import Table


class UnsupportedSQL(ValueError):
    """Statement is outside the router's grammar; message says why."""


_NUM = re.compile(r"^[+-]?\d+(\.\d+)?$")
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_OPS = ("<=", ">=", "==", "=", "<", ">")


def _strip(s: str) -> str:
    """Collapse whitespace runs to single spaces OUTSIDE single-quoted
    string literals. Inside a literal every character is payload:
    ``DELETE FROM t WHERE v = 'a  b'`` must keep both spaces (a naive
    ``' '.join(s.split())`` would silently rewrite the statement to
    match/write different rows). The `''` escape is two adjacent
    quote toggles with nothing between them, so it round-trips
    unchanged."""
    out: list[str] = []
    in_q = False
    pending_space = False
    for ch in s:
        if in_q:
            out.append(ch)
            if ch == "'":
                in_q = False
            continue
        if ch.isspace():
            pending_space = True
            continue
        if pending_space and out:
            out.append(" ")
        pending_space = False
        out.append(ch)
        if ch == "'":
            in_q = True
    return "".join(out)


def _split_depth0(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, respecting single quotes."""
    out, depth, cur, in_q = [], 0, [], False
    for ch in s:
        if in_q:
            cur.append(ch)
            if ch == "'":
                in_q = False
            continue
        if ch == "'":
            in_q = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


def _split_kw_depth0(s: str, kw: str) -> list[str]:
    """Split on a top-level keyword (case-insensitive, word-bounded).

    Case-folds per SLICE, never the whole string: Python ``upper()``
    can CHANGE LENGTH ('ŉ' -> 'ʼN', 'ß' -> 'SS'), so indexing a
    pre-uppercased copy with offsets from the original silently
    misaligns the scan on non-ASCII text (caught by the hypothesis
    round-trip property in tests/test_sql_dml.py)."""
    n = len(kw)
    parts, depth, in_q, i, start = [], 0, False, 0, 0
    while i < len(s):
        ch = s[i]
        if in_q:
            if ch == "'":
                in_q = False
            i += 1
            continue
        if ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + n].upper() == kw
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + n >= len(s)
                or not (s[i + n].isalnum() or s[i + n] == "_")
            )
        ):
            parts.append(s[start:i])
            start = i + n
            i += n
            continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _split_and_depth0(s: str) -> list[str]:
    return _split_kw_depth0(s, "AND")


def _parse_literal(tok: str):
    tok = tok.strip()
    if _NUM.match(tok):
        return float(tok) if "." in tok else int(tok)
    if len(tok) >= 2 and tok[0] == "'" and tok[-1] == "'":
        return tok[1:-1].replace("''", "'")
    up = tok.upper()
    if up == "TRUE":
        return True
    if up == "FALSE":
        return False
    raise UnsupportedSQL(
        f"literal {tok!r} not supported: WHERE predicates take numbers, "
        "'strings', TRUE/FALSE (the stats-prunable filter algebra)"
    )


def _validate_default_literal(field, v: object) -> None:
    """Refuse a CREATE TABLE DEFAULT whose literal can't inhabit the
    column's type — a later cast would silently turn it into NULL."""
    from pyspark.sql.types import BooleanType, NumericType, StringType

    dt = field.dataType
    ok = (
        (isinstance(dt, StringType) and isinstance(v, str))
        or (isinstance(dt, BooleanType) and isinstance(v, bool))
        or (
            isinstance(dt, NumericType)
            and isinstance(v, (int, float))
            and not isinstance(v, bool)
        )
    )
    if not ok:
        raise UnsupportedSQL(
            f"DEFAULT literal {v!r} does not fit column "
            f"{field.name!r} of type {dt.simpleString()} (defaults are "
            "scalar literals matching the column's type family)"
        )


def _parse_partition_field(one: str):
    """One PARTITIONED BY / PARTITION FIELD element -> transform:
    bucket(N, c), truncate(W, c), years/months/days/hours(c), or a
    bare column (identity). Shared by CREATE TABLE's list parse and
    the ALTER ... PARTITION FIELD verbs."""
    from . import transforms as _tf

    tm = re.match(
        r"^(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([A-Za-z_]\w*)\s*\)$",
        one, re.I,
    )
    tm2 = re.match(
        r"^(years?|months?|days?|hours?)\s*\(\s*([A-Za-z_]\w*)\s*\)$",
        one, re.I,
    )
    if tm:
        fn = {"bucket": _tf.bucket, "truncate": _tf.truncate}[
            tm.group(1).lower()
        ]
        return fn(tm.group(3), int(tm.group(2)))
    if tm2:
        fn = {
            "year": _tf.year, "month": _tf.month,
            "day": _tf.day, "hour": _tf.hour,
        }[tm2.group(1).lower().rstrip("s")]
        return fn(tm2.group(2))
    if re.match(r"^[A-Za-z_]\w*$", one):
        return _tf.identity(one)
    raise UnsupportedSQL(
        f"partition fields are bucket(N, c), truncate(W, c), "
        f"years/months/days/hours(c), or a bare column (identity); "
        f"got {one[:60]!r}"
    )


def _validate_partition_literal(field, v: object) -> None:
    """Refuse a static PARTITION (k = v) value the identity layout
    cannot key. Dedicated check (round-12 ADVICE): the DEFAULT-literal
    check both rejected valid combinations with misleading wording and
    accepted ones (string value on a string column) that crash later in
    ``apply_py`` — identity layouts in this engine are integer-identity
    (``IdentityTransform.apply_py`` is ``int(value)``,
    ``apply_arrow`` casts to int64), so the static value must be an
    integer or an integer-rendering string."""
    ok = isinstance(v, int) and not isinstance(v, bool)
    if isinstance(v, str):
        try:
            int(v)
            ok = True
        except ValueError:
            ok = False
    if not ok:
        raise UnsupportedSQL(
            f"PARTITION ({field.name} = {v!r}): static partition "
            "values key an identity layout, which is integer-identity "
            "in this engine — pass an integer literal (transformed or "
            "non-integer layouts take the dynamic form PARTITION "
            f"({field.name}))"
        )


def _parse_predicates(where: str) -> list[tuple[str, str, object]]:
    """Conjunction of ``column <op> literal`` -> (col, op, value) list."""
    if re.search(r"\bOR\b|\bNOT\b|\bIN\b|\bBETWEEN\b|\bLIKE\b", where, re.I):
        raise UnsupportedSQL(
            "only AND-conjunctions of column <op> literal are routable: "
            "they map onto the engine's stats-pruned rewrite planning; "
            "OR/NOT/IN/BETWEEN/LIKE predicates are not (use the Python "
            "API with a manual rewrite if you really need them)"
        )
    preds = []
    for part in _split_and_depth0(where):
        for op in _OPS:
            idx = part.find(op)
            if idx > 0:
                col, lit = part[:idx].strip(), part[idx + len(op) :].strip()
                if not _IDENT.match(col):
                    raise UnsupportedSQL(
                        f"left side {col!r} must be a bare column name"
                    )
                preds.append((col, "=" if op == "==" else op, _parse_literal(lit)))
                break
        else:
            raise UnsupportedSQL(f"cannot parse predicate {part!r}")
    if not preds:
        raise UnsupportedSQL("WHERE clause required (no full-table DML)")
    return preds


# DNF expansion bound: distributing AND over OR can square the branch
# count per conjunct; past this the statement is hand-written obfuscation,
# not a predicate a planner should chase.
_MAX_DNF_BRANCHES = 64


def _parse_leaf(part: str) -> tuple[str, str, object]:
    """One atomic predicate -> (col, op, value) leaf. Beyond the
    scalar ``col <op> literal`` algebra, two stats-prunable set
    shapes (round 14): ``col IN (lit, ...)`` and prefix
    ``col LIKE 'pfx%'``. Everything else refuses loudly with the
    reason — a predicate the planner can't prune on would silently
    rewrite the whole table."""
    part = part.strip()
    if re.match(r"^NOT\b", part, re.I) or re.search(
        r"\bNOT\s+(IN|LIKE)\b", part, re.I
    ):
        raise UnsupportedSQL(
            "NOT predicates are not routable: negation inverts the "
            "stats-admissible set, so file pruning can't bound the "
            "rewrite (rewrite the predicate positively)"
        )
    if re.search(r"\bBETWEEN\b", part, re.I):
        raise UnsupportedSQL(
            "BETWEEN is not routable — spell it as "
            "col >= lo AND col <= hi (the conjunction form prunes)"
        )
    m = re.match(r"^([A-Za-z_]\w*)\s+IN\s*\((.+)\)$", part, re.I | re.S)
    if m:
        col, inner = m.group(1), m.group(2).strip()
        if re.match(r"^SELECT\b|^WITH\b", inner, re.I):
            raise UnsupportedSQL(
                "IN (<subquery>) inside a predicate tree is not "
                "routable — the standalone form DELETE FROM t WHERE "
                "col IN (SELECT ...) routes as a MOR equality delete"
            )
        vals = [_parse_literal(t) for t in _split_depth0(inner)]
        if not vals:
            raise UnsupportedSQL("empty IN list")
        return (col, "in", tuple(vals))
    m = re.match(r"^([A-Za-z_]\w*)\s+LIKE\s+(.+)$", part, re.I | re.S)
    if m:
        col, lit = m.group(1), _parse_literal(m.group(2).strip())
        if (
            not isinstance(lit, str)
            or not lit.endswith("%")
            or re.search(r"[%_]", lit[:-1])
            or len(lit) < 2
        ):
            raise UnsupportedSQL(
                f"LIKE pattern {lit!r} is not routable: only prefix "
                "patterns ('abc%') map onto min/max file pruning — "
                "suffix/infix wildcards and _ would rewrite the whole "
                "table"
            )
        return (col, "like_prefix", lit[:-1])
    for op in _OPS:
        idx = part.find(op)
        if idx > 0:
            col, lit = part[:idx].strip(), part[idx + len(op) :].strip()
            if not _IDENT.match(col):
                raise UnsupportedSQL(
                    f"left side {col!r} must be a bare column name"
                )
            return (col, "=" if op == "==" else op, _parse_literal(lit))
    raise UnsupportedSQL(f"cannot parse predicate {part!r}")


def _paren_covers_whole(s: str) -> bool:
    """True when s is '( ... )' with the opening paren matching the
    FINAL character (quote-aware) — i.e. the parens group the whole
    expression, not two adjacent groups like '(a) AND (b)'."""
    if not (s.startswith("(") and s.endswith(")")):
        return False
    depth, in_q = 0, False
    for i, ch in enumerate(s):
        if in_q:
            if ch == "'":
                in_q = False
            continue
        if ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(s) - 1
    return False


def _parse_where_dnf(where: str) -> list[list[tuple[str, str, object]]]:
    """General WHERE tree (round 14) -> disjunctive normal form:
    a list of OR-branches, each an AND-conjunction of leaves. This is
    the input shape of the engine's union-of-branches file pruning
    (table.DnfFilter): candidates = UNION over branches of each
    branch's stats-admissible files; the rewrite re-tests rows with
    the full residual predicate. Parens group; AND binds tighter than
    OR (standard SQL precedence)."""
    def rec(s: str) -> list[list[tuple[str, str, object]]]:
        s = s.strip()
        if not s:
            raise UnsupportedSQL("empty predicate group")
        while _paren_covers_whole(s):
            s = s[1:-1].strip()
            if not s:
                raise UnsupportedSQL("empty predicate group")
        or_parts = _split_kw_depth0(s, "OR")
        if len(or_parts) > 1:
            out: list[list[tuple[str, str, object]]] = []
            for p in or_parts:
                out.extend(rec(p))
                if len(out) > _MAX_DNF_BRANCHES:
                    raise UnsupportedSQL(
                        f"predicate expands past {_MAX_DNF_BRANCHES} "
                        "OR-branches — simplify the WHERE clause"
                    )
            return out
        and_parts = _split_and_depth0(s)
        if len(and_parts) > 1:
            branches: list[list[tuple[str, str, object]]] = [[]]
            for p in and_parts:
                sub = rec(p)
                branches = [b + c for b in branches for c in sub]
                if len(branches) > _MAX_DNF_BRANCHES:
                    raise UnsupportedSQL(
                        f"predicate expands past {_MAX_DNF_BRANCHES} "
                        "OR-branches — simplify the WHERE clause"
                    )
            return branches
        return [[_parse_leaf(s)]]

    branches = rec(where)
    if not branches or any(not b for b in branches):
        raise UnsupportedSQL("WHERE clause required (no full-table DML)")
    return branches


def _parse_assignments(s: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in _split_depth0(s):
        eq = part.find("=")
        if eq <= 0:
            raise UnsupportedSQL(f"cannot parse assignment {part!r}")
        col, expr = part[:eq].strip(), part[eq + 1 :].strip()
        if not _IDENT.match(col):
            raise UnsupportedSQL(f"assignment target {col!r} must be a column")
        if not expr:
            raise UnsupportedSQL(f"empty expression in assignment {part!r}")
        out[col] = expr
    if not out:
        raise UnsupportedSQL("SET clause is empty")
    return out


_DELETE = re.compile(r"^DELETE\s+FROM\s+(\S+)\s+WHERE\s+(.+)$", re.I | re.S)
_DELETE_IN = re.compile(
    r"^DELETE\s+FROM\s+(\S+)\s+WHERE\s+([A-Za-z_]\w*)\s+IN\s*\((.+)\)$",
    re.I | re.S,
)
_UPDATE = re.compile(
    r"^UPDATE\s+(\S+)\s+SET\s+(.+?)\s+WHERE\s+(.+)$", re.I | re.S
)
_CREATE_VIEW = re.compile(
    r"^CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([A-Za-z_]\w*)\s+AS\s+(.+)$",
    re.I | re.S,
)
_DROP_VIEW = re.compile(r"^DROP\s+VIEW\s+([A-Za-z_]\w*)$", re.I)
# Maintained (materialized) views: the TWO shapes the folds maintain
# incrementally. Agg — measures aliased cnt/sv (or sv_<col> each for
# several sums) because those are the view table's column names
# (create_maintained_agg's contract). Top-k — exactly the standard
# ROW_NUMBER idiom, rank aliased rn (the view's rank column):
#   SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
#     ORDER BY c1[, c2...]) AS rn FROM t) WHERE rn <= N
_CREATE_MATVIEW = re.compile(
    r"^CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)\s+AS\s+"
    r"SELECT\s+([A-Za-z_]\w*)\s*,\s*COUNT\s*\(\s*\*\s*\)\s+AS\s+cnt\s*,\s*"
    r"(.+?)\s+"
    r"FROM\s+([A-Za-z_]\w*)\s+GROUP\s+BY\s+([A-Za-z_]\w*)$",
    re.I | re.S,
)
_SUM_TERM = re.compile(
    r"^SUM\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+([A-Za-z_]\w*)$", re.I
)
_CREATE_MATVIEW_TOPK = re.compile(
    r"^CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)\s+AS\s+"
    r"SELECT\s+\*\s+FROM\s+\(\s*SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s+"
    r"OVER\s*\(\s*PARTITION\s+BY\s+([A-Za-z_]\w*)\s+ORDER\s+BY\s+"
    r"([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)\s+AS\s+rn\s+"
    r"FROM\s+([A-Za-z_]\w*)\s*\)\s+WHERE\s+rn\s*<=\s*(\d+)$",
    re.I | re.S,
)
_CREATE_MATVIEW_EXTREMA = re.compile(
    r"^CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)\s+AS\s+"
    r"SELECT\s+([A-Za-z_]\w*)\s*,\s*"
    r"MIN\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+mn\s*,\s*"
    r"MAX\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+mx\s+"
    r"FROM\s+([A-Za-z_]\w*)\s+GROUP\s+BY\s+([A-Za-z_]\w*)$",
    re.I | re.S,
)
_MATVIEW_HEAD = re.compile(r"^CREATE\s+MATERIALIZED\s+VIEW\b", re.I)
_REFRESH_MV = re.compile(
    r"^REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)$", re.I
)
_REFRESH_ALL_MV = re.compile(r"^REFRESH\s+ALL\s+MATERIALIZED\s+VIEWS$", re.I)
_DROP_MV = re.compile(
    r"^DROP\s+MATERIALIZED\s+VIEW\s+([A-Za-z_]\w*)(\s+PURGE)?$", re.I
)
# Maintenance verbs (the Iceberg/Delta spellings users type): OPTIMIZE
# runs the table's full policy-driven maintenance pass (fold pending
# MOR deletes -> bin-pack small files -> orphan GC — Table.maintain);
# VACUUM expires old snapshots (retain_last defaults to the engine's
# 20) and physically deletes files reachable only from them. Catalog
# semantics: both verbs advance the published pin ONLY when the pin
# was current before the op (content-preserving advance) — a lagging
# pin (unpublished direct-writer commits) stays put, because
# publishing the post-maintenance head would leak unpublished rows to
# catalog readers. VACUUM additionally PROTECTS the published pin
# from expiry (protect_ids), and is refused inside sql_script: a GC
# that outruns the script's end-of-script publish would delete the
# pre-script snapshot readers are still pinned to.
# INSERT INTO (the append verb): full-schema VALUES tuples (literal
# rows — the grammar's literal parser, so strings/numbers/NULL only)
# or INSERT INTO ... SELECT (the query evaluates with Spark against
# the session's registered views; Catalog.sql registers pinned views
# first so catalog tables resolve). Column-list inserts
# (``INSERT INTO t (a, b) VALUES/SELECT``, round 11) fill the ABSENT
# columns deliberately, not silently: a column carrying an initial
# default (the a4d ALTER ... ADD COLUMN ... DEFAULT machinery) fills
# its default VALUE — materialized in the written rows, since new
# entries sit past the default's sequence and the read-side fill
# provably never applies to them — a nullable column fills NULL, and
# an absent NON-nullable column without a default refuses loudly.
_INSERT_VALUES = re.compile(
    r"^INSERT\s+INTO\s+([A-Za-z_]\w*)\s+VALUES\s+(.+)$", re.I | re.S
)
# INSERT INTO t.branch_<ref> (round 13 — Iceberg's branch-write
# spelling): the staged half of write-audit-publish through SQL. The
# append advances ONLY the named branch ref; the table head and the
# catalog pin do not move (readers never see unaudited rows), so this
# deliberately bypasses the end-of-statement pin publish. The branch
# must already exist (ALTER TABLE t CREATE BRANCH) — a typo creating
# a branch silently would hide the staged rows forever.
_INSERT_BRANCH = re.compile(
    r"^INSERT\s+INTO\s+([A-Za-z_]\w*)\.branch_([A-Za-z_]\w*)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
_INSERT_SELECT = re.compile(
    r"^INSERT\s+INTO\s+([A-Za-z_]\w*)\s+(SELECT\b.+|WITH\b.+)$", re.I | re.S
)
_INSERT_COLLIST = re.compile(
    r"^INSERT\s+INTO\s+([A-Za-z_]\w*)\s*"
    r"\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
_INSERT_COLLIST_HEAD = re.compile(
    r"^INSERT\s+INTO\s+([A-Za-z_]\w*)\s*\(", re.I
)
# INSERT OVERWRITE (round 11): the bare verb is STATIC whole-table
# mode — content atomically replaced by the query's/tuples' rows in
# one 'overwrite' snapshot (Spark's default partitionOverwriteMode;
# TRUNCATE is this verb with zero rows). Partition-scoped overwrite
# (round 12) requires an EXPLICIT clause: INSERT OVERWRITE t
# PARTITION (k = v) replaces exactly that identity partition (empty
# source clears it), PARTITION (k) replaces exactly the partitions
# the written rows touch (Spark's dynamic mode, a4e's connector
# machinery). The session-conf-dependent spelling — where the same
# bare statement flips between replacing the table and replacing
# partitions on spark.sql.sources.partitionOverwriteMode — is the
# ambiguity this grammar still refuses; the PARTITION clause names
# the intent in the statement itself.
_INSERT_OVERWRITE = re.compile(
    r"^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
_INSERT_OVERWRITE_PART = re.compile(
    r"^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s+"
    r"PARTITION\s*\(\s*([A-Za-z_]\w*)\s*(?:=\s*([^(),]+?)\s*)?\)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
# composite dynamic form (round 13): PARTITION (c1, c2[, ...]) names
# EVERY field's source column of a composite spec — replace exactly
# the (tuple) partitions the written rows touch. Static values are
# single-field-only (a composite static target would need a full
# tuple literal; the API covers that).
_INSERT_OVERWRITE_PART_MULTI = re.compile(
    r"^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s+"
    r"PARTITION\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)+)\s*\)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
# composite STATIC form (round 14): PARTITION (k1 = v1, k2 = v2[, ...])
# names EVERY field of a composite spec with a value — Hive's static
# overwrite lifted to tuples: exactly that partition TUPLE is
# replaced, the values fill the (identity) partition columns so the
# source omits them, and an empty source CLEARS the tuple. Mixed
# static/dynamic lists stay outside the grammar (the conf-dependent
# Hive spelling this router refuses by design).
_INSERT_OVERWRITE_PART_STATIC_MULTI = re.compile(
    r"^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s+"
    r"PARTITION\s*\(\s*([A-Za-z_]\w*\s*=\s*[^(),]+?"
    r"(?:\s*,\s*[A-Za-z_]\w*\s*=\s*[^(),]+?)+)\s*\)\s+"
    r"(VALUES\s+.+|SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
# CTAS: CREATE TABLE name AS SELECT — the query's result schema
# becomes the table, rows land as the first append, one catalog
# create + pin publish.
_CTAS = re.compile(
    r"^CREATE\s+TABLE\s+([A-Za-z_]\w*)\s+AS\s+(SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
# CREATE OR REPLACE TABLE [AS SELECT] (round 13 — Iceberg RTAS): one
# user-visible catalog publish swaps definition AND content; the
# pre-image stays reachable via /*+ CATALOG_VERSION(n) */ because the
# old pin + old schema vintage survive in the table's own logs.
_RTAS = re.compile(
    r"^CREATE\s+OR\s+REPLACE\s+TABLE\s+([A-Za-z_]\w*)\s+AS\s+"
    r"(SELECT\b.+|WITH\b.+)$",
    re.I | re.S,
)
# Plain CREATE TABLE DDL (round 11): disjoint from CTAS — this form
# requires "(" right after the name. The balanced column group is
# extracted by paren depth (Spark DDL types nest: DECIMAL(10,2),
# ARRAY<STRUCT<...>>), then parsed by Spark's own DDL parser.
_CREATE_TABLE_HEAD = re.compile(
    r"^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([A-Za-z_]\w*)\s*\(", re.I
)
# ALTER TABLE: the engine's schema-evolution ops (metadata-only
# commits to the schema log — no snapshots move, so no pin motion;
# the ops themselves are graded via a3u/a3d/a4d). DROP TABLE
# unregisters from the catalog (PURGE also deletes the directory —
# Iceberg's split).
_ALTER_ADD = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+ADD\s+COLUMN\s+([A-Za-z_]\w*)\s+"
    r"([A-Za-z_][A-Za-z0-9_()]*)(?:\s+DEFAULT\s+(.+))?$",
    re.I,
)
_ALTER_RENAME = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+RENAME\s+COLUMN\s+"
    r"([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)$",
    re.I,
)
_ALTER_TYPE = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+"
    r"TYPE\s+([A-Za-z_][A-Za-z0-9_()]*)$",
    re.I,
)
_ALTER_DROP = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+DROP\s+COLUMN\s+([A-Za-z_]\w*)$",
    re.I,
)
_ALTER_PROPS = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+SET\s+TBLPROPERTIES\s*\((.+)\)$",
    re.I | re.S,
)
_ALTER_ADD_PART_FIELD = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+ADD\s+PARTITION\s+FIELD\s+(.+)$",
    re.I,
)
_ALTER_DROP_PART_FIELD = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+DROP\s+PARTITION\s+FIELD\s+(.+)$",
    re.I,
)
_ALTER_REPLACE_PART_FIELD = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+REPLACE\s+PARTITION\s+FIELD\s+"
    r"(.+?)\s+WITH\s+(.+)$",
    re.I,
)
_ALTER_CREATE_REF = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+CREATE\s+(BRANCH|TAG)\s+"
    r"([A-Za-z_]\w*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?"
    r"(?:\s+RETAIN\s+(\d+)\s+DAYS)?$",
    re.I,
)
_ALTER_DROP_REF = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+DROP\s+(BRANCH|TAG)\s+"
    r"([A-Za-z_]\w*)$",
    re.I,
)
_ALTER_PUBLISH_REF = re.compile(
    r"^ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+PUBLISH\s+BRANCH\s+"
    r"([A-Za-z_]\w*)$",
    re.I,
)
_DROP_TABLE = re.compile(
    r"^DROP\s+TABLE\s+([A-Za-z_]\w*)(\s+PURGE)?$", re.I
)
_TRUNCATE = re.compile(r"^TRUNCATE\s+TABLE\s+([A-Za-z_]\w*)$", re.I)
_OPTIMIZE = re.compile(
    r"^OPTIMIZE\s+([A-Za-z_]\w*)(?:\s+WHERE\s+(.+))?$", re.I | re.S
)
_OPTIMIZE_ZORDER = re.compile(
    r"^OPTIMIZE\s+([A-Za-z_]\w*)\s+ZORDER\s+BY\s*"
    r"\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)$",
    re.I,
)
_VACUUM = re.compile(
    r"^VACUUM\s+([A-Za-z_]\w*)(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?$", re.I
)
_MERGE_HEAD = re.compile(
    r"^MERGE\s+INTO\s+(\S+)(?:\s+AS)?(?:\s+([A-Za-z_]\w*))?\s+USING\s+",
    re.I | re.S,
)
_MERGE_TAIL = re.compile(
    r"^(?:\s*AS)?(?:\s+([A-Za-z_]\w*))?\s+ON\s+(.+?)\s+(WHEN\s+.+)$",
    re.I | re.S,
)


def _match_merge(sql: str):
    """MERGE split: head regex to USING, then the source as either a
    BALANCED-paren subquery (a lazy regex would cut a nested
    ``f(y)`` at the first ``)``) or a bare view name, then the
    ON/WHEN tail. Returns the same 6-tuple the old single regex did,
    or None."""
    hm = _MERGE_HEAD.match(sql)
    if not hm:
        return None
    rest = sql[hm.end() :]
    if rest.startswith("("):
        depth, in_q, i = 0, False, 0
        for i, ch in enumerate(rest):
            if in_q:
                if ch == "'":
                    in_q = False
                continue
            if ch == "'":
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            return None
        src, rest = rest[: i + 1], rest[i + 1 :]
    else:
        sm = re.match(r"^(\S+)", rest)
        if not sm:
            return None
        src, rest = sm.group(1), rest[sm.end() :]
    tm = _MERGE_TAIL.match(rest)
    if not tm:
        return None
    return (hm.group(1), hm.group(2), src, *tm.groups())
_WHEN = re.compile(
    r"WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?(?:\s+AND\s+(.+?))?\s+THEN\s+"
    r"(DELETE|INSERT\s+\*|UPDATE\s+SET\s+.+?)\s*(?=WHEN\s|$)",
    re.I | re.S,
)


def run_dml(
    spark: SparkSession,
    statement: str,
    resolve,
    catalog=None,
) -> dict:
    """Parse + execute one DML statement. ``resolve(name) -> Table``
    maps statement table names onto engine tables (the Catalog passes
    its own lookup). ``catalog`` (a Catalog) enables the view DDL
    statements (CREATE [OR REPLACE] VIEW / DROP VIEW), which are
    catalog-level objects. Returns the underlying operation's stats
    dict, plus ``{"statement": <kind>}``."""
    sql = _strip(statement).rstrip(";").strip()

    if _MATVIEW_HEAD.match(sql):
        if catalog is None:
            raise UnsupportedSQL(
                "CREATE MATERIALIZED VIEW needs a catalog "
                "(maintained views are catalog objects)"
            )
        mt = _CREATE_MATVIEW_TOPK.match(sql)
        if mt:
            name, key, order_cols, source, k = mt.groups()
            from .maintained import create_maintained_topk

            vt = create_maintained_topk(
                catalog, spark, name, source, key,
                [c.strip() for c in order_cols.split(",")], int(k),
            )
            return {
                "statement": "create_materialized_view",
                "view": name,
                "source": source,
                "kind": "topk",
                "snapshot_id": vt.metadata.current_snapshot_id,
            }
        me = _CREATE_MATVIEW_EXTREMA.match(sql)
        if me:
            name, key, mn_col, mx_col, source, group_key = me.groups()
            if key.lower() != group_key.lower():
                raise UnsupportedSQL(
                    f"maintained view key must equal the GROUP BY column "
                    f"(got SELECT {key} ... GROUP BY {group_key})"
                )
            if mn_col.lower() != mx_col.lower():
                raise UnsupportedSQL(
                    "maintained extrema view takes MIN and MAX of the "
                    f"SAME column (got MIN({mn_col}), MAX({mx_col})) — "
                    "create one view per column"
                )
            from .maintained import create_maintained_extrema

            vt = create_maintained_extrema(
                catalog, spark, name, source, key, mn_col
            )
            return {
                "statement": "create_materialized_view",
                "view": name,
                "source": source,
                "kind": "extrema",
                "snapshot_id": vt.metadata.current_snapshot_id,
            }
        m = _CREATE_MATVIEW.match(sql)
        if not m:
            raise UnsupportedSQL(
                "CREATE MATERIALIZED VIEW accepts exactly the three "
                "incrementally-maintainable shapes: the agg — SELECT "
                "<key>, COUNT(*) AS cnt, SUM(<col>) AS sv FROM <table> "
                "GROUP BY <key> (measures NAMED cnt/sv, or sv_<col> "
                "each for several sums) — the extrema — SELECT <key>, "
                "MIN(<col>) AS mn, MAX(<col>) AS mx FROM <table> GROUP "
                "BY <key> (deletes rebuild only the touched keys from "
                "source) — and the top-k ROW_NUMBER idiom — SELECT * "
                "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
                "ORDER BY c1[, c2]) AS rn FROM t) WHERE rn <= N"
            )
        name, key, sums, source, group_key = m.groups()
        if key.lower() != group_key.lower():
            raise UnsupportedSQL(
                f"maintained view key must equal the GROUP BY column "
                f"(got SELECT {key} ... GROUP BY {group_key})"
            )
        terms = []
        for part in _split_depth0(sums, ","):
            t = _SUM_TERM.match(part.strip())
            if not t:
                raise UnsupportedSQL(
                    f"maintained view measure {part.strip()!r} is not "
                    "SUM(<col>) AS <alias> — only count/sum are "
                    "additively maintainable under deletes"
                )
            terms.append((t.group(1), t.group(2)))
        # alias contract = the view table's column names: one SUM keeps
        # the original 'sv'; several name each 'sv_<col>'
        if len(terms) == 1:
            col, alias = terms[0]
            if alias.lower() != "sv":
                raise UnsupportedSQL(
                    f"a single SUM measure must be aliased AS sv (the "
                    f"view's column name); got AS {alias}"
                )
            value: str | list[str] = col
        else:
            for col, alias in terms:
                if alias.lower() != f"sv_{col.lower()}":
                    raise UnsupportedSQL(
                        f"multi-measure SUM({col}) must be aliased AS "
                        f"sv_{col} (the view's column name); got AS {alias}"
                    )
            value = [col for col, _ in terms]
        from .maintained import create_maintained_agg

        vt = create_maintained_agg(catalog, spark, name, source, key, value)
        return {
            "statement": "create_materialized_view",
            "view": name,
            "source": source,
            "snapshot_id": vt.metadata.current_snapshot_id,
        }

    m = _REFRESH_MV.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "REFRESH MATERIALIZED VIEW needs a catalog"
            )
        from .maintained import refresh_maintained

        res = refresh_maintained(catalog, spark, m.group(1))
        return {
            "statement": "refresh_materialized_view",
            "view": m.group(1),
            **res,
        }

    m = _DROP_MV.match(sql)
    if m:
        # maintained views ARE engine tables, but DROP TABLE on one
        # would be surprising in the other direction — this verb
        # checks the object really is a maintained view (mv.kind) and
        # refuses for plain tables, the mirror of DROP TABLE refusing
        # is not needed there (tables are the general case). Another
        # view may still SOURCE the dropped one: refresh_all will then
        # fail loudly on the missing source — same contract as
        # dropping a table out from under a dependent catalog view.
        if catalog is None:
            raise UnsupportedSQL("DROP MATERIALIZED VIEW needs a catalog")
        name, purge = m.groups()
        props = catalog.table(name).metadata.properties
        if props.get("mv.kind") not in ("topk", "agg", "extrema"):
            raise UnsupportedSQL(
                f"{name!r} is not a maintained view — use DROP TABLE"
            )
        catalog.drop_table(name, purge=bool(purge))
        return {
            "statement": "drop_materialized_view",
            "view": name,
            "purged": bool(purge),
        }

    if _REFRESH_ALL_MV.match(sql):
        if catalog is None:
            raise UnsupportedSQL(
                "REFRESH ALL MATERIALIZED VIEWS needs a catalog"
            )
        from .maintained import refresh_all_maintained

        res = refresh_all_maintained(catalog, spark)
        return {
            "statement": "refresh_all_materialized_views",
            "refreshed": {k: v.get("refreshed") for k, v in res.items()},
        }

    def _registered_select(query: str) -> DataFrame:
        """Evaluate a SELECT/WITH for a write verb's source rows. With
        a catalog, tables resolve to the PINNED state (same semantics
        as Catalog.sql's read pass-through); without one, against the
        session's existing views."""
        if catalog is not None:
            catalog.register_views(spark)
        return spark.sql(query)

    def _append_rows(name: str, rows_df: DataFrame) -> dict:
        tbl = resolve(name)
        target = tbl.schema()
        if [f.name for f in rows_df.schema.fields] != [
            f.name for f in target.fields
        ]:
            raise UnsupportedSQL(
                f"INSERT source columns {rows_df.columns} must match the "
                f"table schema {[f.name for f in target.fields]} exactly "
                "(full-schema inserts only)"
            )
        aligned = rows_df.select(
            *[F.col(f.name).cast(f.dataType) for f in target.fields]
        ).persist()  # count + append: one evaluation of a SELECT source
        try:
            n = aligned.count()
            tbl.append(aligned)
        finally:
            aligned.unpersist()
        return {"statement": "insert", "table": name, "inserted_rows": n}

    def _parse_values_tuples(body: str) -> list[list]:
        tuples = []
        for grp in _split_depth0(body, ","):
            grp = grp.strip()
            if not (grp.startswith("(") and grp.endswith(")")):
                raise UnsupportedSQL(
                    f"INSERT VALUES expects parenthesized tuples; got "
                    f"{grp[:40]!r}"
                )
            tuples.append(
                [
                    None
                    if tok.strip().upper() == "NULL"
                    else _parse_literal(tok)
                    for tok in _split_depth0(grp[1:-1], ",")
                ]
            )
        return tuples

    def _literal_rows_df(tuples: list[list], fields: list) -> DataFrame:
        # SQL implicit numeric widening: an int literal into a
        # double/float column is standard SQL (1 means 1.0); PySpark's
        # createDataFrame type check would reject it with an opaque
        # TypeError, so coerce python-side and turn any residual
        # mismatch into the grammar's loud refusal
        from pyspark.sql.types import StructType

        def _coerce(v, f):
            t = f.dataType.simpleString()
            if v is None:
                return None
            if t in ("double", "float") and isinstance(v, int):
                return float(v)
            return v

        names = [f.name for f in fields]
        try:
            return spark.createDataFrame(
                [
                    dict(zip(names, (_coerce(v, f) for v, f in zip(t, fields))))
                    for t in tuples
                ],
                StructType(fields),
            )
        except TypeError as e:
            raise UnsupportedSQL(
                f"INSERT VALUES literal does not fit the table schema: {e}"
            ) from e

    m = _INSERT_COLLIST.match(sql)
    if m:
        # column-list INSERT (round 11): absent columns fill their
        # initial default if they carry one (materialized in the
        # written rows — new entries sit past the default's sequence,
        # so the read-side fill never applies to them), NULL if
        # nullable, and refuse loudly otherwise. Listed columns map
        # POSITIONALLY onto the VALUES tuples / SELECT output.
        from .table import _defaults_of

        name, collist, tail_sql = m.groups()
        cols = [c.strip() for c in _split_depth0(collist, ",")]
        if len({c.lower() for c in cols}) != len(cols):
            raise UnsupportedSQL(
                f"duplicate columns in INSERT column list: {cols}"
            )
        target = (resolve if catalog is None else catalog.table)(name).schema()
        # case-INSENSITIVE name lookup (like the duplicate check above
        # and the matview key compares): INSERT INTO t (ID) hits
        # column "id"; the schema's canonical spelling is what the
        # fill/select below uses
        by_name = {f.name.lower(): f for f in target.fields}
        unknown = [c for c in cols if c.lower() not in by_name]
        if unknown:
            raise UnsupportedSQL(
                f"INSERT column list names unknown columns {unknown}; "
                f"table {name!r} has {[f.name for f in target.fields]}"
            )
        cols = [by_name[c.lower()].name for c in cols]
        defaults = _defaults_of(target)
        fills: dict[str, object] = {}
        listed = set(cols)
        for f in target.fields:
            if f.name in listed:
                continue
            if f.name in defaults:
                fills[f.name] = defaults[f.name][0]
            elif f.nullable:
                fills[f.name] = None
            else:
                raise UnsupportedSQL(
                    f"column-list INSERT omits non-nullable column "
                    f"{f.name!r} with no default — list it explicitly "
                    "or ALTER the table to add a default"
                )
        tail_parts = tail_sql.split(None, 1)
        if tail_parts[0].upper() == "VALUES":
            # split(None) tolerates ANY whitespace after VALUES — the
            # regex does too, so "VALUES\n(1)" must not read as empty
            tuples = _parse_values_tuples(
                tail_parts[1] if len(tail_parts) > 1 else ""
            )
            if any(len(t) != len(cols) for t in tuples):
                raise UnsupportedSQL(
                    f"INSERT VALUES arity mismatch: column list has "
                    f"{len(cols)} columns"
                )
            rows_df = _literal_rows_df(
                tuples, [by_name[c.lower()] for c in cols]
            )
        else:
            rows_df = _registered_select(tail_sql)
            if len(rows_df.columns) != len(cols):
                raise UnsupportedSQL(
                    f"INSERT SELECT arity mismatch: column list has "
                    f"{len(cols)} columns, query returns "
                    f"{len(rows_df.columns)}"
                )
            rows_df = rows_df.toDF(*cols)
        full = rows_df.select(
            *[
                (
                    F.col(f.name)
                    if f.name in listed
                    else F.lit(fills[f.name])
                )
                .cast(f.dataType)
                .alias(f.name)
                for f in target.fields
            ]
        )
        return _append_rows(name, full)

    m = _INSERT_BRANCH.match(sql)
    if m:
        name, ref, tail_sql = m.groups()
        # direct table lookup, NOT resolve(): a branch write must not
        # ride the end-of-statement pin publish (the head is
        # untouched; republishing it could leak a direct writer's
        # unpublished head — the _schema_target rationale)
        tbl = catalog.table(name) if catalog is not None else resolve(name)
        have = tbl.metadata.refs.get(ref)
        if have is None or have["type"] != "branch":
            raise UnsupportedSQL(
                f"no branch {ref!r} on table {name!r}: create it first "
                f"(ALTER TABLE {name} CREATE BRANCH {ref}) — writes "
                "never create refs implicitly"
            )
        target = tbl.schema()
        tail_parts = tail_sql.split(None, 1)
        if tail_parts[0].upper() == "VALUES":
            tuples = _parse_values_tuples(
                tail_parts[1] if len(tail_parts) > 1 else ""
            )
            if any(len(tp) != len(target.fields) for tp in tuples):
                raise UnsupportedSQL(
                    f"INSERT arity mismatch: table {name!r} has "
                    f"{len(target.fields)} columns"
                )
            rows_df = _literal_rows_df(tuples, list(target.fields))
        else:
            rows_df = _registered_select(tail_sql)
            if [c.lower() for c in rows_df.columns] != [
                f.name.lower() for f in target.fields
            ]:
                raise UnsupportedSQL(
                    f"INSERT ... SELECT columns {rows_df.columns} must "
                    f"match {[f.name for f in target.fields]} exactly"
                )
        aligned = rows_df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
        )
        # ONE evaluation of a SELECT source: no pre-count job — the
        # append's manifest stats already carry the row total
        # ('added-rows'), so a non-deterministic source can never make
        # inserted_rows disagree with what landed on the branch
        snap = tbl.append(aligned, branch=ref)
        return {
            "statement": "insert_branch",
            "table": name,
            "branch": ref,
            "inserted_rows": int(snap.summary.get("added-rows", 0)),
            "branch_head": tbl.metadata.refs[ref]["snapshot_id"],
        }

    m = _INSERT_VALUES.match(sql)
    if m:
        name, body = m.groups()
        tuples = _parse_values_tuples(body)
        target = (resolve if catalog is None else catalog.table)(name).schema()
        if any(len(t) != len(target.fields) for t in tuples):
            raise UnsupportedSQL(
                f"INSERT VALUES arity mismatch: table {name!r} has "
                f"{len(target.fields)} columns"
            )
        return _append_rows(name, _literal_rows_df(tuples, list(target.fields)))

    m = _INSERT_OVERWRITE_PART_MULTI.match(sql)
    if m:
        # composite dynamic overwrite (round 13): PARTITION (c1, c2)
        # names every field's source column of a composite spec —
        # written rows choose their partition TUPLES, exactly those
        # tuples are replaced, untouched tuples carry by reference in
        # one atomic 'overwrite' snapshot (the a4e/a5b contract lifted
        # to multi-field layouts).
        name, collist, tail_sql = m.groups()
        tbl = resolve(name)
        target = tbl.schema()
        t = tbl.transform
        from .transforms import CompositeTransform as _Composite

        cols = [c.strip() for c in collist.split(",")]
        if not isinstance(t, _Composite):
            raise UnsupportedSQL(
                f"PARTITION names {len(cols)} columns but table "
                f"{name!r} "
                + (
                    "is unpartitioned"
                    if t is None
                    else f"partitions on ONE field ({t.source_column!r})"
                )
            )
        if [c.lower() for c in cols] != [
            c.lower() for c in t.source_columns
        ]:
            raise UnsupportedSQL(
                f"PARTITION must name the composite spec's source "
                f"columns in spec order "
                f"({', '.join(t.source_columns)}); got ({collist})"
            )
        fields = list(target.fields)
        tail_parts = tail_sql.split(None, 1)
        if tail_parts[0].upper() == "VALUES":
            tuples = _parse_values_tuples(
                tail_parts[1] if len(tail_parts) > 1 else ""
            )
            if any(len(tp) != len(fields) for tp in tuples):
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION arity mismatch: "
                    f"source rows take {len(fields)} columns "
                    f"({[f.name for f in fields]})"
                )
            rows_df = _literal_rows_df(tuples, fields)
        else:
            rows_df = _registered_select(tail_sql)
            if [c.lower() for c in rows_df.columns] != [
                f.name.lower() for f in fields
            ]:
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION source columns "
                    f"{rows_df.columns} must match "
                    f"{[f.name for f in fields]} exactly"
                )
        aligned = rows_df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        ).persist()
        try:
            n = aligned.count()
            entries = tbl._write_data_files(aligned) if n else []
            from .table import _entry_partition_key

            parts = {_entry_partition_key(e) for e in entries}
            if entries:
                tbl.overwrite_entries(entries, partitions=parts)
        finally:
            aligned.unpersist()
        return {
            "statement": "insert_overwrite",
            "table": name,
            "mode": "dynamic_partition",
            "inserted_rows": n,
            "replaced_partitions": sorted(
                [list(p) for p in parts] if entries else []
            ),
        }

    m = _INSERT_OVERWRITE_PART_STATIC_MULTI.match(sql)
    if m:
        # composite STATIC overwrite (round 14): the full-tuple form
        # of a5b's single-field static verb. Every field of the
        # composite spec must be named with a value, in spec order;
        # every field must be an IDENTITY layout (the value fills the
        # column — a transformed field's bucket value cannot
        # reconstruct its source column, so transformed composites
        # take the dynamic form). Exactly ONE tuple is replaced —
        # the daily reload of a (day, bucket) table costs one tuple's
        # files, not the table — and an empty source clears it.
        name, kvlist, tail_sql = m.groups()
        tbl = resolve(name)
        target = tbl.schema()
        t = tbl.transform
        from .transforms import CompositeTransform as _Composite
        from .transforms import IdentityTransform

        pairs = []
        for item in _split_depth0(kvlist, ","):
            km = re.match(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", item.strip())
            if not km:
                raise UnsupportedSQL(
                    f"PARTITION static item {item.strip()!r} must be "
                    "col = literal"
                )
            pairs.append((km.group(1), _parse_literal(km.group(2).strip())))
        if not isinstance(t, _Composite):
            raise UnsupportedSQL(
                f"PARTITION names {len(pairs)} columns but table "
                f"{name!r} "
                + (
                    "is unpartitioned"
                    if t is None
                    else f"partitions on ONE field ({t.source_column!r})"
                )
            )
        if [k.lower() for k, _ in pairs] != [
            c.lower() for c in t.source_columns
        ]:
            raise UnsupportedSQL(
                f"PARTITION must name the composite spec's source "
                f"columns in spec order "
                f"({', '.join(t.source_columns)}); got ({kvlist})"
            )
        for ft in t.fields:
            if not isinstance(ft, IdentityTransform):
                raise UnsupportedSQL(
                    "static composite overwrite maps onto all-identity "
                    f"layouts; field {ft.to_json()['transform']}"
                    f"({ft.source_column}) is transformed — use the "
                    "DYNAMIC form PARTITION "
                    f"({', '.join(t.source_columns)})"
                )
        by_name = {f.name.lower(): f for f in target.fields}
        for k, v in pairs:
            _validate_partition_literal(by_name[k.lower()], v)
        named = {k.lower() for k, _ in pairs}
        fields = [
            f for f in target.fields if f.name.lower() not in named
        ]
        tail_parts = tail_sql.split(None, 1)
        if tail_parts[0].upper() == "VALUES":
            tuples = _parse_values_tuples(
                tail_parts[1] if len(tail_parts) > 1 else ""
            )
            if any(len(tp) != len(fields) for tp in tuples):
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION arity mismatch: "
                    f"source rows take {len(fields)} columns "
                    f"({[f.name for f in fields]}) — the static "
                    "values fill the partition columns"
                )
            rows_df = _literal_rows_df(tuples, fields)
        else:
            rows_df = _registered_select(tail_sql)
            if [c.lower() for c in rows_df.columns] != [
                f.name.lower() for f in fields
            ]:
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION source columns "
                    f"{rows_df.columns} must match "
                    f"{[f.name for f in fields]} exactly (the static "
                    "values fill the partition columns — the source "
                    "omits them)"
                )
        for k, v in pairs:
            rows_df = rows_df.withColumn(by_name[k.lower()].name, F.lit(v))
        aligned = rows_df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
        ).persist()
        try:
            n = aligned.count()
            entries = tbl._write_data_files(aligned) if n else []
            ptuple = tuple(
                ft.apply_py(v) for ft, (_, v) in zip(t.fields, pairs)
            )
            # static ALWAYS commits — an empty source CLEARS the tuple
            tbl.overwrite_entries(entries, partitions={ptuple})
        finally:
            aligned.unpersist()
        return {
            "statement": "insert_overwrite",
            "table": name,
            "mode": "static_partition",
            "inserted_rows": n,
            "replaced_partitions": [list(ptuple)],
        }

    m = _INSERT_OVERWRITE_PART.match(sql)
    if m:
        # partition-scoped overwrite (round 12): the clause names the
        # intent IN the statement — PARTITION (k = v) is Hive/Spark
        # static form (replace exactly that partition; empty source
        # clears it; the value fills the column, so the source omits
        # it), PARTITION (k) is dynamic form (replace exactly the
        # partitions the written rows touch — a4e's connector
        # machinery, one atomic 'overwrite' snapshot, untouched
        # partitions carried by reference at zero data cost).
        name, pcol, plit, tail_sql = m.groups()
        tbl = resolve(name)
        target = tbl.schema()
        t = tbl.transform
        if t is None:
            raise UnsupportedSQL(
                f"table {name!r} is unpartitioned: PARTITION-scoped "
                "overwrite needs a partitioned table (bare INSERT "
                "OVERWRITE replaces the whole table)"
            )
        from .transforms import CompositeTransform as _Composite

        if isinstance(t, _Composite):
            raise UnsupportedSQL(
                f"table {name!r} has a composite partition spec: name "
                f"EVERY field's source column for a dynamic overwrite "
                f"— PARTITION ({', '.join(t.source_columns)}) — or use "
                "bare INSERT OVERWRITE (atomic whole-table replace)"
            )
        if pcol.lower() != t.source_column.lower():
            raise UnsupportedSQL(
                f"PARTITION names {pcol!r} but table {name!r} "
                f"partitions on {t.source_column!r}"
            )
        from .transforms import IdentityTransform

        static = plit is not None
        pfield = next(
            f for f in target.fields
            if f.name.lower() == t.source_column.lower()
        )
        if static:
            if not isinstance(t, IdentityTransform):
                raise UnsupportedSQL(
                    "PARTITION (col = value) is the STATIC form and "
                    "maps onto an identity layout only; transformed "
                    "layouts (bucket/truncate/temporal) take the "
                    "DYNAMIC form PARTITION (col) — written rows "
                    "choose their partitions"
                )
            pv = _parse_literal(plit.strip())
            _validate_partition_literal(pfield, pv)
            fields = [
                f for f in target.fields
                if f.name.lower() != pcol.lower()
            ]
        else:
            fields = list(target.fields)
        tail_parts = tail_sql.split(None, 1)
        if tail_parts[0].upper() == "VALUES":
            tuples = _parse_values_tuples(
                tail_parts[1] if len(tail_parts) > 1 else ""
            )
            if any(len(tp) != len(fields) for tp in tuples):
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION arity mismatch: "
                    f"source rows take {len(fields)} columns "
                    f"({[f.name for f in fields]})"
                )
            rows_df = _literal_rows_df(tuples, fields)
        else:
            rows_df = _registered_select(tail_sql)
            if [c.lower() for c in rows_df.columns] != [
                f.name.lower() for f in fields
            ]:
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE PARTITION source columns "
                    f"{rows_df.columns} must match "
                    f"{[f.name for f in fields]} exactly"
                    + (
                        " (the static value fills the partition "
                        "column — the source omits it)"
                        if static
                        else ""
                    )
                )
        if static:
            rows_df = rows_df.withColumn(pfield.name, F.lit(pv))
        aligned = rows_df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
        ).persist()
        try:
            n = aligned.count()
            entries = tbl._write_data_files(aligned) if n else []
            if static:
                parts: set = {t.apply_py(pv)}
            else:
                parts = {e["partition"] for e in entries}
            # dynamic with an empty source replaces nothing (matches
            # the connector); static ALWAYS commits — an empty source
            # CLEARS the named partition, Hive semantics
            if entries or static:
                tbl.overwrite_entries(entries, partitions=parts)
        finally:
            aligned.unpersist()
        return {
            "statement": "insert_overwrite",
            "table": name,
            "mode": "static_partition" if static else "dynamic_partition",
            "inserted_rows": n,
            "replaced_partitions": sorted(parts) if (entries or static) else [],
        }

    m = _INSERT_OVERWRITE.match(sql)
    if m:
        name, tail_sql = m.groups()
        target = (resolve if catalog is None else catalog.table)(name).schema()
        if tail_sql.split(None, 1)[0].upper() == "VALUES":
            tuples = _parse_values_tuples(tail_sql.split(None, 1)[1])
            if any(len(t) != len(target.fields) for t in tuples):
                raise UnsupportedSQL(
                    f"INSERT OVERWRITE VALUES arity mismatch: table "
                    f"{name!r} has {len(target.fields)} columns"
                )
            rows_df = _literal_rows_df(tuples, list(target.fields))
        else:
            rows_df = _registered_select(tail_sql)
        if [f.name for f in rows_df.schema.fields] != [
            f.name for f in target.fields
        ]:
            raise UnsupportedSQL(
                f"INSERT OVERWRITE source columns {rows_df.columns} must "
                f"match the table schema "
                f"{[f.name for f in target.fields]} exactly"
            )
        tbl = resolve(name)
        aligned = rows_df.select(
            *[F.col(f.name).cast(f.dataType) for f in target.fields]
        ).persist()
        try:
            n = aligned.count()
            # one atomic 'overwrite' snapshot: old content stays
            # time-travelable, readers see old or new, never a mix
            tbl.overwrite_entries(tbl._write_data_files(aligned))
        finally:
            aligned.unpersist()
        return {
            "statement": "insert_overwrite",
            "table": name,
            "inserted_rows": n,
        }

    m = _INSERT_SELECT.match(sql)
    if m:
        name, query = m.groups()
        return _append_rows(name, _registered_select(query))

    if _INSERT_COLLIST_HEAD.match(sql):
        raise UnsupportedSQL(
            "column-list INSERT not recognized: expected "
            "INSERT INTO t (col[, col...]) VALUES (...)[, ...] "
            "or INSERT INTO t (col[, col...]) SELECT ..."
        )

    m = _CREATE_TABLE_HEAD.match(sql)
    if m:
        # CREATE TABLE name (col type [NOT NULL], ...) — plain DDL
        # (round 11), the first statement a SQL user types. The column
        # list parses with Spark's own DDL parser (full type surface:
        # DECIMAL(p,s), ARRAY<...>, nested parens welcome), so the
        # balanced-paren group is extracted by depth, not regex.
        # PARTITIONED BY takes a comma list of Iceberg-DDL
        # transforms — bucket(N, col), truncate(W, col), years/months/
        # days/hours(col), or a bare column for identity — matching
        # the engine's transform set (R3/a3w/a4a); two or more fields
        # compose into a composite spec (round 13). TBLPROPERTIES
        # reuses the ALTER pairs grammar.
        if catalog is None:
            raise UnsupportedSQL(
                "CREATE TABLE needs a catalog (tables are catalog objects)"
            )
        or_replace = m.group(1) is not None
        name = m.group(2)
        start = m.end() - 1
        depth = 0
        end = -1
        for i in range(start, len(sql)):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise UnsupportedSQL("CREATE TABLE: unbalanced parentheses")
        cols_src = sql[start + 1 : end]
        rest = sql[end + 1 :].strip()
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        # DEFAULT <literal> per column (round 12): extracted BEFORE
        # Spark's DDL parser sees the list (fromDDL has no DEFAULT
        # clause), stamped as initial_default metadata with seq -1 —
        # write-side fill for column-list INSERTs applies, read-side
        # vintage fill (entry seq <= default seq) provably never does
        # on a freshly created table. This is what makes SHOW CREATE
        # TABLE's emitted DEFAULT clause round-trippable.
        col_defaults: dict[str, object] = {}
        cleaned: list[str] = []
        for chunk in _split_depth0(cols_src, ","):
            dm = re.search(
                r"\s+DEFAULT\s+('(?:[^']|'')*'|[^\s]+)"
                r"(\s+NOT\s+NULL)?\s*$",
                chunk,
                re.I,
            )
            if dm:
                v = _parse_literal(dm.group(1))
                cname = chunk.split()[0]
                col_defaults[cname.lower()] = v
                chunk = chunk[: dm.start()] + (dm.group(2) or "")
            cleaned.append(chunk)
        try:
            schema = _ST.fromDDL(",".join(cleaned))
        except Exception as e:
            raise UnsupportedSQL(
                f"CREATE TABLE column list does not parse as Spark DDL: "
                f"{str(e)[:200]}"
            ) from e
        if col_defaults:
            fields = []
            for f in schema.fields:
                if f.name.lower() in col_defaults:
                    v = col_defaults[f.name.lower()]
                    _validate_default_literal(f, v)
                    md = dict(f.metadata or {})
                    md.update({"initial_default": v, "default_seq": -1})
                    f = _SF(f.name, f.dataType, f.nullable, md)
                fields.append(f)
            schema = _ST(fields)
        part = None
        spec = None
        pm = re.match(r"^PARTITIONED\s+BY\s*\(", rest, re.I)
        if pm:
            depth, end = 0, -1
            for i in range(pm.end() - 1, len(rest)):
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            if end < 0:
                raise UnsupportedSQL("PARTITIONED BY: unbalanced parentheses")
            spec = rest[pm.end() : end].strip()
            rest = rest[end + 1 :].strip()
            from . import transforms as _tf

            # multi-field specs (round 13, Iceberg parity): a comma
            # list composes per-field transforms — e.g.
            # PARTITIONED BY (days(ts), bucket(16, id)), the layout
            # real event tables use at scale
            flds = [
                _parse_partition_field(s.strip())
                for s in _split_depth0(spec, ",")
                if s.strip()
            ]
            if not flds:
                raise UnsupportedSQL("PARTITIONED BY: empty field list")
            part = flds[0] if len(flds) == 1 else _tf.composite(*flds)
        props: dict[str, str] = {}
        tp = re.match(r"^TBLPROPERTIES\s*\((.+)\)$", rest, re.I | re.S)
        if tp:
            for pair in _split_depth0(tp.group(1), ","):
                kv = _split_depth0(pair, "=")
                if len(kv) != 2:
                    raise UnsupportedSQL(
                        f"TBLPROPERTIES expects 'key' = 'value' pairs; "
                        f"got {pair.strip()!r}"
                    )
                k, v = (_parse_literal(x.strip()) for x in kv)
                if not isinstance(k, str) or not isinstance(v, str):
                    raise UnsupportedSQL(
                        "TBLPROPERTIES keys and values are quoted strings"
                    )
                props[k] = v
        elif rest:
            raise UnsupportedSQL(
                f"CREATE TABLE trailing clause not recognized: {rest[:60]!r}"
            )
        st = catalog.state()
        if or_replace and name.lower() in {v.lower() for v in st.views}:
            raise UnsupportedSQL(
                f"{name!r} is a view: CREATE OR REPLACE TABLE replaces "
                "tables — use CREATE OR REPLACE VIEW"
            )
        # the replace-vs-create decision resolves the target CASE-
        # INSENSITIVELY, like the view-collision check above: a case
        # variant of an existing table must REPLACE it (under its
        # canonical spelling), not fall through to create_table and
        # fail with a confusing 'exists' error
        canon = next(
            (p for p in st.pins if p.lower() == name.lower()), None
        )
        if or_replace and canon is not None:
            name = canon
            # column-list RTAS: swap definition, spec and properties,
            # truncate content — one user-visible pin publish (the
            # AS-SELECT branch below documents the atomicity model)
            tbl = catalog.table(name)
            if tbl.metadata.properties.get("mv.kind"):
                raise UnsupportedSQL(
                    f"{name!r} is a maintained view's backing table: "
                    "DROP MATERIALIZED VIEW and recreate"
                )
            from .transforms import validate_transform as _vt

            _vt(part, schema)
            tbl.set_schema(schema)
            if tbl.metadata.partition_spec != (
                part.to_json() if part is not None else None
            ):
                tbl.update_partition_spec(part)
            if props:
                tbl.set_properties(props)
            tbl.overwrite_entries(
                [], extra_summary={"replace-table": "true"}
            )
            catalog._commit_pins(
                {name: tbl.metadata.current_snapshot_id}
            )
            return {
                "statement": "replace_table",
                "table": name,
                "columns": [f.name for f in schema.fields],
                "partition": spec,
            }
        try:
            catalog.create_table(
                name, schema,
                partition=part,
                **({"properties": props} if props else {}),
            )
        except ValueError as e:
            raise UnsupportedSQL(str(e)) from e
        return {
            "statement": "create_table",
            "table": name,
            "columns": [f.name for f in schema.fields],
            "partition": spec,
        }

    m = _RTAS.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "CREATE OR REPLACE TABLE needs a catalog (tables are "
                "catalog objects)"
            )
        name, query = m.groups()
        st = catalog.state()
        if name.lower() in {v.lower() for v in st.views}:
            raise UnsupportedSQL(
                f"{name!r} is a view: CREATE OR REPLACE TABLE replaces "
                "tables — use CREATE OR REPLACE VIEW"
            )
        # case-insensitive target resolution, same rationale as the
        # column-list branch: a case variant replaces the existing
        # table under its canonical spelling
        canon = next(
            (p for p in st.pins if p.lower() == name.lower()), None
        )
        exists = canon is not None
        if exists:
            name = canon
        if exists and catalog.table(name).metadata.properties.get("mv.kind"):
            raise UnsupportedSQL(
                f"{name!r} is a maintained view's backing table: "
                "replacing it out from under the fold corrupts the "
                "view contract — DROP MATERIALIZED VIEW and recreate"
            )
        rows_df = _registered_select(query).persist()
        try:
            n = rows_df.count()
            if exists:
                # table-internal staging commits (schema swap, data
                # write, content overwrite) are invisible through the
                # catalog until the SINGLE pin publish below — readers
                # see the old table or the new one, never a mix, and
                # CATALOG_VERSION(pre) still serves the pre-image
                tbl = catalog.table(name)
                tbl.set_schema(rows_df.schema)
                if tbl.metadata.partition_spec is not None:
                    # RTAS states the whole new definition: no
                    # PARTITIONED BY clause = unpartitioned (and the
                    # old spec's source columns may not even exist in
                    # the new schema); old files keep pruning under
                    # their own spec via spec_id
                    tbl.update_partition_spec(None)
                entries = tbl._write_data_files(rows_df) if n else []
                tbl.overwrite_entries(
                    entries, extra_summary={"replace-table": "true"}
                )
            else:
                tbl = catalog.create_table(name, rows_df.schema)
                tbl.append(rows_df)
        finally:
            rows_df.unpersist()
        catalog._commit_pins({name: tbl.metadata.current_snapshot_id})
        return {
            "statement": "replace_table_as",
            "table": name,
            "inserted_rows": n,
            "replaced": exists,
        }

    m = _CTAS.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "CREATE TABLE AS SELECT needs a catalog (tables are "
                "catalog objects)"
            )
        name, query = m.groups()
        rows_df = _registered_select(query).persist()
        try:
            tbl = catalog.create_table(name, rows_df.schema)
            n = rows_df.count()
            tbl.append(rows_df)
        finally:
            rows_df.unpersist()
        catalog._commit_pins({name: tbl.metadata.current_snapshot_id})
        return {
            "statement": "create_table_as",
            "table": name,
            "inserted_rows": n,
        }

    def _schema_target(name: str) -> Table:
        """Table lookup for schema-evolution verbs: bypasses resolve()
        when a catalog is present — these commit to the SCHEMA log,
        not the snapshot lineage, so there is nothing to publish, and
        the resolve-triggered pin publish would leak a direct writer's
        unpublished head (the OPTIMIZE/VACUUM rationale)."""
        return catalog.table(name) if catalog is not None else resolve(name)

    m = _ALTER_ADD.match(sql)
    if m:
        name, col, dtype, default = m.groups()
        _schema_target(name).add_column(
            col,
            dtype.lower(),
            default=None if default is None else _parse_literal(default),
        )
        return {"statement": "alter_add_column", "table": name, "column": col}

    m = _ALTER_RENAME.match(sql)
    if m:
        name, old, new = m.groups()
        _schema_target(name).rename_column(old, new)
        return {
            "statement": "alter_rename_column", "table": name,
            "from": old, "to": new,
        }

    m = _ALTER_TYPE.match(sql)
    if m:
        name, col, dtype = m.groups()
        _schema_target(name).widen_column(col, dtype.lower())
        return {
            "statement": "alter_column_type", "table": name,
            "column": col, "type": dtype.lower(),
        }

    m = _ALTER_DROP.match(sql)
    if m:
        name, col = m.groups()
        _schema_target(name).drop_column(col)
        return {"statement": "alter_drop_column", "table": name, "column": col}

    m = _ALTER_PROPS.match(sql)
    if m:
        name, body = m.groups()
        updates: dict[str, str] = {}
        for pair in _split_depth0(body, ","):
            kv = _split_depth0(pair, "=")
            if len(kv) != 2:
                raise UnsupportedSQL(
                    f"SET TBLPROPERTIES expects 'key' = 'value' pairs; "
                    f"got {pair.strip()!r}"
                )
            k, v = (_parse_literal(x.strip()) for x in kv)
            if not isinstance(k, str) or not isinstance(v, str):
                raise UnsupportedSQL(
                    "SET TBLPROPERTIES keys and values are quoted strings"
                )
            updates[k] = v
        _schema_target(name).set_properties(updates)
        return {
            "statement": "alter_set_properties", "table": name,
            "properties": sorted(updates),
        }

    def _partition_fields_of(t) -> list:
        from .transforms import CompositeTransform as _C

        if t is None:
            return []
        return list(t.fields) if isinstance(t, _C) else [t]

    def _spec_from_fields(fields: list):
        from . import transforms as _tf

        if not fields:
            return None
        return fields[0] if len(fields) == 1 else _tf.composite(*fields)

    m = _ALTER_ADD_PART_FIELD.match(sql)
    if m:
        # ALTER TABLE t ADD|DROP|REPLACE PARTITION FIELD (round 13 —
        # Iceberg's partition-evolution DDL, the SQL face of
        # update_partition_spec): metadata-only, no data rewrite;
        # existing files keep pruning under the spec they were written
        # with (entries carry spec_id), future writes use the new one.
        # ADD onto a 1-field spec composes a composite; DROP down to
        # one field collapses back to the single transform.
        name, fexpr = m.groups()
        tbl = _schema_target(name)
        new_f = _parse_partition_field(fexpr.strip())
        fields = _partition_fields_of(tbl.transform)
        if any(f.to_json() == new_f.to_json() for f in fields):
            raise UnsupportedSQL(
                f"partition field {fexpr.strip()!r} already on "
                f"table {name!r}"
            )
        sid = tbl.update_partition_spec(
            _spec_from_fields(fields + [new_f])
        )
        return {
            "statement": "add_partition_field", "table": name,
            "field": fexpr.strip(), "spec_id": sid,
            "n_fields": len(fields) + 1,
        }

    m = _ALTER_DROP_PART_FIELD.match(sql)
    if m:
        name, fexpr = m.groups()
        tbl = _schema_target(name)
        drop_f = _parse_partition_field(fexpr.strip())
        fields = _partition_fields_of(tbl.transform)
        kept = [f for f in fields if f.to_json() != drop_f.to_json()]
        if len(kept) == len(fields):
            raise UnsupportedSQL(
                f"no partition field {fexpr.strip()!r} on table "
                f"{name!r} (spec: "
                f"{[f.to_json() for f in fields] or 'unpartitioned'})"
            )
        sid = tbl.update_partition_spec(_spec_from_fields(kept))
        return {
            "statement": "drop_partition_field", "table": name,
            "field": fexpr.strip(), "spec_id": sid,
            "n_fields": len(kept),
        }

    m = _ALTER_REPLACE_PART_FIELD.match(sql)
    if m:
        name, old_expr, new_expr = m.groups()
        tbl = _schema_target(name)
        old_f = _parse_partition_field(old_expr.strip())
        new_f = _parse_partition_field(new_expr.strip())
        fields = _partition_fields_of(tbl.transform)
        if not any(f.to_json() == old_f.to_json() for f in fields):
            raise UnsupportedSQL(
                f"no partition field {old_expr.strip()!r} on table "
                f"{name!r} to replace"
            )
        # duplicate pre-check mirrors ADD's: without it the collision
        # surfaces as a generic ValueError from validate_transform at
        # commit time instead of the router's targeted refusal
        if any(
            f.to_json() == new_f.to_json()
            and f.to_json() != old_f.to_json()
            for f in fields
        ):
            raise UnsupportedSQL(
                f"partition field {new_expr.strip()!r} already on "
                f"table {name!r}"
            )
        swapped = [
            new_f if f.to_json() == old_f.to_json() else f
            for f in fields
        ]
        sid = tbl.update_partition_spec(_spec_from_fields(swapped))
        return {
            "statement": "replace_partition_field", "table": name,
            "from": old_expr.strip(), "to": new_expr.strip(),
            "spec_id": sid,
        }

    m = _ALTER_CREATE_REF.match(sql)
    if m:
        # ALTER TABLE t CREATE BRANCH|TAG r [AS OF VERSION n] (round
        # 13 — Iceberg's branching DDL, the SQL face of the WAP refs
        # the API had since a4g/a3z): a branch is a movable ref staged
        # writes advance without touching the head; a tag is an
        # immutable pin. Both are GC roots. Default AS OF = the
        # table's current head snapshot; the read face is
        # VERSION AS OF '<ref>' (a5a). Metadata-only — no pin moves.
        name, kind, ref, ver, retain_days = m.groups()
        tbl = _schema_target(name)
        sid = int(ver) if ver is not None else None
        # RETAIN n DAYS (round 14 — Iceberg's branch/tag retention
        # DDL): per-ref max age honored by VACUUM / expire_snapshots;
        # without it, branches inherit the table default
        # history.expire.max-ref-age-ms and tags never age out
        age_ms = (
            int(retain_days) * 86_400_000 if retain_days is not None else None
        )
        if kind.upper() == "BRANCH":
            tbl.create_branch(ref, snapshot_id=sid, max_ref_age_ms=age_ms)
        else:
            tbl.create_tag(ref, snapshot_id=sid, max_ref_age_ms=age_ms)
        out = {
            "statement": "create_ref", "table": name,
            "ref": ref, "type": kind.lower(),
            "snapshot_id": tbl.metadata.refs[ref]["snapshot_id"],
        }
        if age_ms is not None:
            out["max_ref_age_ms"] = age_ms
        return out

    m = _ALTER_DROP_REF.match(sql)
    if m:
        name, kind, ref = m.groups()
        tbl = _schema_target(name)
        have = tbl.metadata.refs.get(ref)
        if have is None:
            raise KeyError(f"no such ref {ref!r} on table {name!r}")
        if have["type"] != kind.lower():
            # dropping a TAG with DROP BRANCH (or vice versa) is a
            # category error, not a fuzzy match — Iceberg refuses too
            raise UnsupportedSQL(
                f"{ref!r} is a {have['type']}, not a {kind.lower()}: "
                f"use DROP {have['type'].upper()}"
            )
        tbl.drop_ref(ref)
        return {
            "statement": "drop_ref", "table": name,
            "ref": ref, "type": kind.lower(),
        }

    m = _TRUNCATE.match(sql)
    if m:
        # static INSERT OVERWRITE with no entries: one metadata commit
        # removes every row; prior snapshots stay time-travelable until
        # VACUUM (Iceberg TRUNCATE semantics, not a directory wipe)
        resolve(m.group(1)).overwrite_entries([])
        return {"statement": "truncate", "table": m.group(1)}

    m = _DROP_TABLE.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "DROP TABLE needs a catalog (tables are catalog objects)"
            )
        name, purge = m.groups()
        catalog.drop_table(name, purge=bool(purge))
        return {
            "statement": "drop_table", "table": name, "purged": bool(purge),
        }

    def _maintenance_target(name: str):
        """(table, published pin) for a maintenance verb. With a
        catalog the lookup bypasses ``resolve`` on purpose: resolve()
        marks the table touched, and the caller's end-of-statement
        publish would advance the pin to the post-maintenance HEAD —
        wrong when the pin lags the head (see the verbs' comment
        above); pin movement is decided here instead."""
        if catalog is not None:
            return catalog.table(name), catalog.state().pins.get(name)
        return resolve(name), None

    def _maintenance_republish(name: str, tbl, pinned, pre_head) -> bool:
        if catalog is not None and pinned == pre_head:
            catalog._commit_pins(
                {name: Table(tbl.root).metadata.current_snapshot_id}
            )
            return True
        return False

    m = _ALTER_PUBLISH_REF.match(sql)
    if m:
        # ALTER TABLE t PUBLISH BRANCH b (round 13): the publish half
        # of write-audit-publish — fast-forward the table head to the
        # audited branch head (refuses non-fast-forward; that needs
        # cherry_pick, a deliberate decision). Iceberg spells this as
        # the fast_forward procedure; the engine keeps it an ALTER
        # verb. Pin discipline matches OPTIMIZE/VACUUM: the catalog
        # pin advances only if it tracked the pre-publish head, so a
        # deliberately lagging published pin never jumps.
        name, ref = m.groups()
        tbl, pinned = _maintenance_target(name)
        pre_head = tbl.metadata.current_snapshot_id
        tbl.publish_branch(ref)
        published = _maintenance_republish(name, tbl, pinned, pre_head)
        return {
            "statement": "publish_branch", "table": name, "ref": ref,
            "pin_published": published,
            "head": Table(tbl.root).metadata.current_snapshot_id,
        }

    m = _OPTIMIZE_ZORDER.match(sql)
    if m:
        # OPTIMIZE t ZORDER BY (c1[, c2, c3]) (round 12 — Delta's
        # spelling onto the engine's a3i machinery): Morton-code
        # layout rewrite so per-file min/max stats prune scans on
        # EVERY named column, one content-preserving 'replace'
        # snapshot. Whole-table by contract (a layout rewrite scoped
        # to one partition composes poorly with range-partitioned
        # z-values; run the scoped WHERE form for plain bin-packing).
        name, collist = m.groups()
        tbl, pinned = _maintenance_target(name)
        pre_head = tbl.metadata.current_snapshot_id
        cols = [c.strip() for c in collist.split(",")]
        from pyspark.sql.types import NumericType

        by_lower = {f.name.lower(): f for f in tbl.schema().fields}
        bad = [c for c in cols if c.lower() not in by_lower]
        if bad:
            raise UnsupportedSQL(
                f"ZORDER BY names unknown columns {bad}; table "
                f"{name!r} has {[f.name for f in tbl.schema().fields]}"
            )
        if len({c.lower() for c in cols}) != len(cols):
            raise UnsupportedSQL(
                f"duplicate columns in ZORDER BY: {cols}"
            )
        fields = [by_lower[c.lower()] for c in cols]
        untyped = [
            f.name
            for f in fields
            if not isinstance(f.dataType, NumericType)
        ]
        if untyped:
            raise UnsupportedSQL(
                f"ZORDER BY takes numeric columns (the Morton code "
                f"interleaves scaled integer bits); {untyped} are not"
            )
        if len(fields) > 3:
            raise UnsupportedSQL(
                "ZORDER BY supports at most 3 columns (16 bits per "
                "dimension must fit a 64-bit z-value)"
            )
        res = {
            "zorder": tbl.rewrite_clustered(
                spark, cluster_by=[f.name for f in fields]
            )
        }
        published = _maintenance_republish(name, tbl, pinned, pre_head)
        return {
            "statement": "optimize", "table": name,
            "pin_published": published, **res,
        }

    m = _OPTIMIZE.match(sql)
    if m:
        name, where = m.groups()
        tbl, pinned = _maintenance_target(name)
        pre_head = tbl.metadata.current_snapshot_id
        if where is not None:
            # OPTIMIZE t WHERE <partition-col> = <lit> (round 12 —
            # Iceberg/Delta selective compaction): scope the rewrite
            # to ONE identity partition. Compaction ONLY — snapshot
            # expiry and orphan GC are table-global concerns a
            # partition-scoped verb must not smuggle in; run plain
            # OPTIMIZE / VACUUM for those. The predicate grammar is
            # one equality on the partition source column: that is
            # what maps onto a partition value — anything else would
            # silently rewrite more than the statement names.
            t = tbl.transform
            if t is None:
                raise UnsupportedSQL(
                    f"table {name!r} is unpartitioned: OPTIMIZE ... "
                    "WHERE scopes compaction to a partition — run "
                    "plain OPTIMIZE"
                )
            preds = _parse_predicates(where.strip())
            if len(preds) != 1 or preds[0][1] != "=":
                raise UnsupportedSQL(
                    "OPTIMIZE ... WHERE takes exactly one "
                    "<partition-col> = <literal> predicate (it must "
                    "name one partition)"
                )
            col, _, val = preds[0]
            from .transforms import CompositeTransform as _Composite
            from .transforms import IdentityTransform

            if isinstance(t, _Composite):
                # round 14: scope compaction by ONE identity field of
                # a composite spec — compact EVERY tuple matching that
                # field's value (the daily ask on a (days(ts),
                # bucket(n, id)) layout: compact today's day across
                # all its hash buckets). Transformed fields keep
                # refusing: their bucket value is not the statement's
                # literal, so "which partitions did I just compact"
                # would have no honest answer.
                hit = [
                    (i, ft)
                    for i, ft in enumerate(t.fields)
                    if ft.source_column.lower() == col.lower()
                ]
                if not hit:
                    raise UnsupportedSQL(
                        f"OPTIMIZE ... WHERE names {col!r} but the "
                        f"composite spec of {name!r} partitions on "
                        f"({', '.join(t.source_columns)})"
                    )
                fi, ft = hit[0]
                if not isinstance(ft, IdentityTransform):
                    raise UnsupportedSQL(
                        "OPTIMIZE ... WHERE on a composite spec scopes "
                        f"by an IDENTITY field; {col!r} is "
                        f"{ft.to_json()['transform']}({ft.source_column})"
                        " — run plain OPTIMIZE or compact_data_files"
                    )
                if not isinstance(val, int) or isinstance(val, bool):
                    raise UnsupportedSQL(
                        "OPTIMIZE ... WHERE: identity partitions take "
                        "an integer literal"
                    )
                pv = ft.apply_py(val)
                cur_sid = tbl.current_spec_id()
                from .table import _entry_partition_key

                tuples = {
                    _entry_partition_key(e)
                    for e in tbl.current_files()
                    if int(e.get("spec_id", 0) or 0) == cur_sid
                    and (e.get("partition_fields") or [])[fi : fi + 1]
                    == [pv]
                }
                res = {
                    "compact": tbl.compact_data_files(
                        spark, partitions=tuples
                    )
                    if tuples
                    else {"rewritten": 0, "new_files": 0},
                    "matched_tuples": sorted(
                        [list(p) for p in tuples]
                    ),
                }
            else:
                if col.lower() != t.source_column.lower():
                    raise UnsupportedSQL(
                        f"OPTIMIZE ... WHERE names {col!r} but table "
                        f"{name!r} partitions on {t.source_column!r}"
                    )
                if not isinstance(t, IdentityTransform):
                    raise UnsupportedSQL(
                        "OPTIMIZE ... WHERE maps onto an identity layout; "
                        "transformed layouts (bucket/truncate/temporal) "
                        "compact whole-table via plain OPTIMIZE"
                    )
                if not isinstance(val, int) or isinstance(val, bool):
                    raise UnsupportedSQL(
                        "OPTIMIZE ... WHERE: identity partitions take an "
                        "integer literal"
                    )
                res = {
                    "compact": tbl.compact_data_files(
                        spark, partitions={t.apply_py(val)}
                    )
                }
        else:
            res = tbl.maintain(spark)
        published = _maintenance_republish(name, tbl, pinned, pre_head)
        return {
            "statement": "optimize", "table": name,
            "pin_published": published, **res,
        }

    m = _VACUUM.match(sql)
    if m:
        import time as _time

        name, retain = m.groups()
        tbl, pinned = _maintenance_target(name)
        pre_head = tbl.metadata.current_snapshot_id
        res = tbl.expire_snapshots(
            older_than_ms=int(_time.time() * 1000),
            retain_last=int(retain) if retain else 20,
            spark=spark,
            protect_ids={pinned} if pinned is not None else None,
        )
        published = _maintenance_republish(name, tbl, pinned, pre_head)
        return {
            "statement": "vacuum", "table": name,
            "pin_published": published, **res,
        }

    m = _CREATE_VIEW.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "CREATE VIEW needs a catalog (views are catalog objects)"
            )
        replace, name, body = m.groups()
        st = catalog.create_view(name, body.strip(), replace=bool(replace))
        return {
            "statement": "create_view",
            "view": name,
            "catalog_version": st.version,
        }

    m = _DROP_VIEW.match(sql)
    if m:
        if catalog is None:
            raise UnsupportedSQL(
                "DROP VIEW needs a catalog (views are catalog objects)"
            )
        catalog.drop_view(m.group(1))
        return {"statement": "drop_view", "view": m.group(1)}

    m = _DELETE_IN.match(sql)
    if m:
        # DELETE ... WHERE col IN (subquery | literal list): the key-set
        # delete real pipelines hit most (GDPR erasure, backfill undo).
        # Routes onto the MOR EQUALITY delete — key tuples registered in
        # one metadata commit, zero data files read or rewritten now
        # (Iceberg v2 equality deletes), applied at read time.
        # The greedy regex also matches compound predicates that merely
        # END with ')' (e.g. '... IN (1) AND g IN (3)'); those parse as
        # neither subquery nor literal list and fall through to the
        # general predicate tree below instead of refusing here.
        name, col, inner = m.groups()
        inner = inner.strip()
        keys = None
        if re.match(r"^SELECT\b", inner, re.I):
            keys = spark.sql(inner)
            if len(keys.columns) != 1:
                raise UnsupportedSQL(
                    f"IN subquery must select exactly one column "
                    f"(got {len(keys.columns)})"
                )
            keys = keys.toDF(col)
        else:
            try:
                vals = [_parse_literal(t) for t in _split_depth0(inner)]
            except UnsupportedSQL:
                vals = None  # not a literal list -> general tree
            if vals is not None:
                if not vals:
                    raise UnsupportedSQL("empty IN list")
                keys = spark.createDataFrame(
                    [(v,) for v in vals]
                ).toDF(col)
        if keys is not None:
            tbl = resolve(name)
            n_keys = keys.distinct().count()
            snap = tbl.delete_eq_mor(spark, keys, [col])
            return {
                "statement": "delete",
                "mode": "eq_mor",
                "deleted_keys": n_keys,
                "committed": snap is not None,
            }

    m = _DELETE.match(sql)
    if m:
        from .table import DnfFilter

        tbl: Table = resolve(m.group(1))
        branches = _parse_where_dnf(m.group(2))
        res = tbl.delete_rows(spark, DnfFilter(branches))
        return {"statement": "delete", **res}

    m = _UPDATE.match(sql)
    if m:
        from .table import DnfFilter

        tbl = resolve(m.group(1))
        sets = _parse_assignments(m.group(2))
        branches = _parse_where_dnf(m.group(3))
        res = tbl.update_where(spark, DnfFilter(branches), sets)
        return {"statement": "update", **res}

    m = _match_merge(sql)
    if m:
        name, t_alias, src_sql, s_alias, on_sql, whens = m
        t_alias = t_alias or name
        on = []
        for part in _split_and_depth0(on_sql):
            pm = re.match(
                r"^([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*"
                r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)$",
                part.strip(),
            )
            if not pm:
                raise UnsupportedSQL(
                    f"ON condition {part!r} must be alias.col = alias.col "
                    "(equi-join keys only — that is what merge_into's "
                    "key-bound file pruning needs)"
                )
            a1, c1, a2, c2 = pm.groups()
            if c1 != c2:
                raise UnsupportedSQL(
                    f"ON keys must share a name on both sides ({c1} != {c2})"
                )
            aliases = {a1, a2}
            if s_alias and s_alias not in aliases or t_alias not in aliases:
                raise UnsupportedSQL(
                    f"ON aliases {aliases} don't match MERGE aliases "
                    f"({t_alias!r}, {s_alias!r})"
                )
            on.append(c1)
        update = None
        update_condition = None
        delete_condition = None
        insert = False
        delete_not_matched_by_source = False
        update_not_matched_by_source = None

        def norm_aliases(expr: str) -> str:
            # merge_into's clause language uses t. / s. aliases
            out = expr
            if t_alias and t_alias != "t":
                out = re.sub(rf"\b{re.escape(t_alias)}\.", "t.", out)
            if s_alias and s_alias != "s":
                out = re.sub(rf"\b{re.escape(s_alias)}\.", "s.", out)
            return out

        consumed = 0
        for wm in _WHEN.finditer(whens):
            consumed += 1
            is_not, by_source, cond, action = wm.groups()
            action_up = _strip(action).upper()
            if by_source:
                # full-sync clauses (SQL:2023 / Delta): target keys
                # absent from the source are deleted (the mirror) or
                # updated with t.*-only expressions (flag-stale-rows,
                # round 14). Conditions stay outside the tiny grammar;
                # the two actions are mutually exclusive (same
                # absent-key set).
                if not is_not or cond:
                    raise UnsupportedSQL(
                        "BY SOURCE takes exactly 'WHEN NOT MATCHED BY "
                        "SOURCE THEN DELETE | UPDATE SET ...' "
                        "(unconditional)"
                    )
                if (
                    delete_not_matched_by_source
                    or update_not_matched_by_source is not None
                ):
                    raise UnsupportedSQL(
                        "duplicate WHEN NOT MATCHED BY SOURCE clause "
                        "(DELETE and UPDATE both act on the same "
                        "absent-key set — use one)"
                    )
                if action_up == "DELETE":
                    delete_not_matched_by_source = True
                elif action_up.startswith("UPDATE SET"):
                    set_sql = _strip(action)[len("UPDATE SET") :].strip()
                    if set_sql == "*":
                        raise UnsupportedSQL(
                            "BY SOURCE UPDATE SET * is meaningless — "
                            "there is no source row to copy; list "
                            "t.*-only assignments"
                        )
                    update_not_matched_by_source = {
                        c: norm_aliases(e)
                        for c, e in _parse_assignments(set_sql).items()
                    }
                    srcref = [
                        c
                        for c, e in update_not_matched_by_source.items()
                        if re.search(r"\bs\.", e)
                    ]
                    if srcref:
                        raise UnsupportedSQL(
                            "BY SOURCE UPDATE expressions reference "
                            f"the source in {srcref} — absent-key rows "
                            "have no source row; use t.* only"
                        )
                else:
                    raise UnsupportedSQL(
                        "BY SOURCE takes exactly 'WHEN NOT MATCHED BY "
                        "SOURCE THEN DELETE | UPDATE SET ...'"
                    )
            elif is_not:
                if cond or action_up != "INSERT *":
                    raise UnsupportedSQL(
                        "WHEN NOT MATCHED supports exactly "
                        "'THEN INSERT *' (full source row)"
                    )
                insert = True
            elif action_up == "DELETE":
                # merge_into executes DELETE before UPDATE; SQL evaluates
                # WHEN clauses in WRITTEN order with first-match-wins. A
                # DELETE written after an UPDATE would therefore run with
                # different semantics than written (the delete would fire
                # where SQL would have updated) — refuse instead of
                # silently reordering. Same for a second DELETE clause
                # (last-one-wins would drop the first silently).
                if delete_condition is not None:
                    raise UnsupportedSQL(
                        "multiple WHEN MATCHED ... DELETE clauses are not "
                        "routable (the engine has one delete condition)"
                    )
                if update is not None:
                    raise UnsupportedSQL(
                        "WHEN MATCHED ... DELETE written AFTER an UPDATE "
                        "clause is not routable: the engine applies DELETE "
                        "before UPDATE, which would reorder SQL's in-order "
                        "first-match evaluation — write the DELETE clause "
                        "first"
                    )
                delete_condition = norm_aliases(cond) if cond else "true"
            elif action_up.startswith("UPDATE SET"):
                if update is not None:
                    raise UnsupportedSQL(
                        "multiple WHEN MATCHED ... UPDATE clauses are not "
                        "routable (SQL's first-match across several UPDATE "
                        "conditions has no engine equivalent)"
                    )
                set_sql = _strip(action)[len("UPDATE SET") :].strip()
                if set_sql == "*":
                    update = "all"
                else:
                    update = {
                        c: norm_aliases(e)
                        for c, e in _parse_assignments(set_sql).items()
                    }
                update_condition = norm_aliases(cond) if cond else None
            else:
                raise UnsupportedSQL(f"unsupported WHEN action {action!r}")
        if not consumed or not _WHEN.sub("", whens).strip() == "":
            raise UnsupportedSQL(
                f"unparsed MERGE clauses in {whens!r} (supported: WHEN "
                "MATCHED [AND cond] THEN UPDATE SET/DELETE, WHEN NOT "
                "MATCHED THEN INSERT *)"
            )
        # grammar is fully validated — only now touch the catalog/session
        tbl = resolve(name)
        if src_sql.startswith("("):
            source: DataFrame = spark.sql(src_sql[1:-1])
        else:
            source = spark.table(src_sql)
        res = tbl.merge_into(
            spark,
            source,
            on,
            update=update,
            update_condition=update_condition,
            delete_condition=delete_condition,
            insert=insert,
            delete_not_matched_by_source=delete_not_matched_by_source,
            update_not_matched_by_source=update_not_matched_by_source,
        )
        return {"statement": "merge", **res}

    head = sql.split(None, 1)[0].upper() if sql else ""
    if head in (
        "DELETE", "UPDATE", "MERGE", "CREATE", "DROP", "REFRESH",
        "OPTIMIZE", "VACUUM", "INSERT", "ALTER", "TRUNCATE",
    ):
        raise UnsupportedSQL(
            f"statement shape not recognized for {head}: {sql[:80]!r}"
        )
    raise UnsupportedSQL(
        f"not a routable DML statement (got {head or 'empty'}; SELECTs route "
        "through Catalog.sql's read pass-through — register_views + "
        "spark.sql under one pinned state)"
    )
