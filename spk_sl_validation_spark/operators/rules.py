"""Rule-cascade compiler — the engine's signature component.

The reference's core operator is an *ordered cascade of conditional
masked assignments* on a mutable ``Comment`` column
(``df.loc[mask, "Comment"] = "literal"`` ~34 times across
SL_SPK_Cleansing.py:119-303, Status_Cleansing.py:112-161; see
SURVEY.md §2.8). Semantics:

- rules run in program order;
- a rule with guard ``IF_NULL`` only fires where the comment is still
  null (first-match-wins);
- a rule with guard ``ALWAYS`` overwrites any earlier comment
  (e.g. the dual-source rule SL_SPK_Cleansing.py:128);
- a rule with guard ``SENTINEL(v)`` only fires where the current
  comment equals the sentinel string ``v`` (the Apex cascade,
  SL_SPK_Cleansing.py:165-202, guards every rule on the sentinel
  comment planted by an earlier cascade).

Because Spark columns are immutable, a cascade compiles to a single
Column expression by left-folding::

    expr_0 = initial (lit(None) or an existing column)
    expr_i = when(cond_i & guard_i(expr_{i-1}), lit(msg_i)).otherwise(expr_{i-1})

Catalyst collapses the nested CaseWhen chain; no custom optimizer rule
is needed. The whole cascade evaluates inside whole-stage codegen with
zero shuffles — at 100 TB it is a pure map stage.

``compile_to_sql`` emits an equivalent *flat* ANSI-SQL expression (the
nested fold would blow up exponentially when guards reference the
running expression) by abstract interpretation over the running value
— see its docstring. All three guards flatten, including SENTINEL, so
every reference cascade (A/B/C/D) is DuckDB-oracle-checkable; golden
fixture tests (SURVEY.md §5.2.2) cover the same semantics row-by-row.

Null-semantics note (SURVEY.md §4.4.1): pandas ``NaN != 'x'`` is True,
Spark ``null != 'x'`` is null (treated false by ``when``). Conditions
that need pandas semantics must be built with the null-safe helpers in
``functions.scalar`` (``neq`` → ``NOT (a <=> b)`` / SQL
``IS DISTINCT FROM``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class Guard(Enum):
    """When a rule is allowed to fire, relative to the running value."""

    IF_NULL = "if_null"  # fire only where the running comment is null
    ALWAYS = "always"  # fire regardless; overwrites earlier matches
    SENTINEL = "sentinel"  # fire only where running comment == sentinel value


@dataclass(frozen=True)
class Rule:
    """One step of a cascade.

    ``condition`` is a Spark Column (or a callable taking the running
    comment expression, for conditions that reference the comment
    itself). ``condition_sql`` is the equivalent ANSI-SQL predicate
    used by :func:`compile_to_sql` for oracle generation — optional,
    only needed when the cascade is part of a DuckDB-checked query.
    """

    rule_id: str
    condition: Column | Callable[[Column], Column]
    message: str | None  # None → rule only performs extra_assignments (e.g. A0a)
    guard: Guard = Guard.IF_NULL
    sentinel: str | None = None
    condition_sql: str | None = None
    extra_assignments: dict[str, Column] = field(default_factory=dict)

    def fire_condition(self, running: Column) -> Column:
        cond = self.condition(running) if callable(self.condition) else self.condition
        if self.guard is Guard.IF_NULL:
            return cond & running.isNull()
        if self.guard is Guard.SENTINEL:
            if self.sentinel is None:
                raise ValueError(f"rule {self.rule_id}: SENTINEL guard needs a sentinel value")
            return cond & (running == F.lit(self.sentinel))
        return cond


def compile_to_column(rules: Sequence[Rule], initial: Column | None = None) -> Column:
    """Fold an ordered rule list into one Column expression.

    Exactly reproduces sequential masked assignment: each step
    overwrites the running value where its (condition AND guard)
    holds, else keeps the previous value.
    """
    expr = initial if initial is not None else F.lit(None).cast("string")
    for rule in rules:
        if rule.message is None:
            continue
        expr = F.when(rule.fire_condition(expr), F.lit(rule.message)).otherwise(expr)
    return expr


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


class _Abstract:
    """Marker for the two non-literal abstract values the symbolic fold
    tracks: "still the initial expression" and "still null"."""

    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.name}>"


_INIT = _Abstract("INIT")
_NULL = _Abstract("NULL")

#: Hard cap on the flat-SQL cascade fold's accumulated predicate text.
#: Generous for every reference cascade (≤ 8 rules ≈ 10 KB) while
#: stopping the O(2^n) ALWAYS-rule blowup long before a megabyte CASE
#: string reaches a SQL parser.
_MAX_SQL_BYTES = 512 * 1024


def compile_to_sql(rules: Sequence[Rule], initial_sql: str | None = None) -> str:
    """Flat ANSI-SQL equivalent of :func:`compile_to_column`, covering
    ALL three guards (including SENTINEL).

    A naive textual fold references the running expression twice per
    step (fire test + else branch) and blows up exponentially. Instead
    this does abstract interpretation over the running VALUE: after any
    prefix of the cascade the value is one of {initial expression,
    null, some message literal} — a set of at most n+2 symbols. The
    fold maintains a map ``value -> predicate`` (disjoint, null-free
    predicates over the rule conditions); each rule moves probability
    mass from the values its guard admits into its message:

    - ALWAYS fires on every value where the condition holds;
    - IF_NULL fires on the null symbol (plus the initial symbol under
      ``initial IS NULL``);
    - SENTINEL(v) fires on the message symbol equal to ``v`` — a
      *static* string comparison — plus the initial symbol under
      ``initial = 'v'``.

    The result is one flat CASE whose branch predicates are mutually
    exclusive. Size note: the fold copies each value's running
    predicate into BOTH its survivor branch (``p AND NOT fire``) and
    the fired accumulator (``p AND fire``), so a rule whose guard
    admits a value roughly doubles that value's predicate text —
    worst case O(2^n) for an ALWAYS-heavy n-rule cascade. That is
    harmless at reference scale (largest cascade: 8 rules, ~10 KB of
    SQL) and the fold enforces ``_MAX_SQL_BYTES`` as a hard guard —
    config-driven cascades of arbitrary length get a clear error
    pointing at :func:`compile_to_column` (whose expression tree
    shares subtrees in memory and lowers through Catalyst's
    common-subexpression elimination) instead of an engine-breaking
    megabyte CASE string.

    Null discipline: every rule condition is wrapped ``coalesce(cond,
    FALSE)`` so NOT behaves classically, exactly matching Spark's
    ``when`` which treats a null condition as false.
    """
    commenting = [r for r in rules if r.message is not None]
    for r in commenting:
        if r.condition_sql is None:
            raise ValueError(f"rule {r.rule_id}: condition_sql required for SQL compilation")

    start: object = _INIT if initial_sql is not None else _NULL
    preds: dict[object, str] = {start: "TRUE"}

    def _or(a: str | None, b: str) -> str:
        return b if a is None else f"({a} OR {b})"

    for r in commenting:
        cond = f"coalesce(({r.condition_sql}), FALSE)"
        new_preds: dict[object, str] = {}
        fired: str | None = None
        for v, p in preds.items():
            if r.guard is Guard.ALWAYS:
                fire = cond
            elif r.guard is Guard.IF_NULL:
                if v is _NULL:
                    fire = cond
                elif v is _INIT:
                    fire = f"({cond} AND ({initial_sql}) IS NULL)"
                else:
                    fire = None  # literal messages are never null
            else:  # Guard.SENTINEL
                if r.sentinel is None:
                    raise ValueError(f"rule {r.rule_id}: SENTINEL guard needs a sentinel value")
                if v is _INIT:
                    fire = (
                        f"({cond} AND coalesce(({initial_sql}) = "
                        f"{_sql_quote(r.sentinel)}, FALSE))"
                    )
                elif v is _NULL:
                    fire = None  # null never equals the sentinel
                else:
                    fire = cond if v == r.sentinel else None  # static compare
            if fire is None:
                new_preds[v] = _or(new_preds.get(v), p)
            else:
                new_preds[v] = _or(new_preds.get(v), f"({p} AND NOT {fire})")
                fired = _or(fired, f"({p} AND {fire})")
        if fired is not None:
            new_preds[r.message] = _or(new_preds.get(r.message), fired)
        preds = new_preds
        total = sum(len(p) for p in preds.values())
        if total > _MAX_SQL_BYTES:
            raise ValueError(
                f"compile_to_sql: cascade fold grew to {total} bytes of SQL after "
                f"rule {r.rule_id!r} (ALWAYS-heavy cascades double the fold text "
                f"per rule — worst case O(2^n)); evaluate this cascade with "
                f"compile_to_column/apply_cascade instead of a flat SQL string"
            )

    whens: list[str] = []
    for v, p in preds.items():
        if v is _NULL:
            continue  # falls through to the implicit ELSE NULL
        if v is _INIT:
            whens.append(f"WHEN {p} THEN ({initial_sql})")
        else:
            whens.append(f"WHEN {p} THEN {_sql_quote(v)}")
    if not whens:
        return "CAST(NULL AS VARCHAR)"
    return "CASE " + " ".join(whens) + " END"


def apply_cascade(df, rules: Sequence[Rule], target: str = "Comment", initial_from_target: bool = True):
    """Apply a cascade to ``df``, writing the result into ``target``.

    If ``target`` already exists and ``initial_from_target`` is True,
    the existing column seeds the fold (matching the reference, where
    later cascades continue mutating the same Comment column).

    Rules may carry ``extra_assignments``: additional columns to set
    where the rule fires (e.g. rule A0b sets BOTH ``Vendor to SPK``
    and ``Comment`` — SL_SPK_Cleansing.py:120-121). Extra assignments
    are applied with the same fire condition, evaluated against the
    running comment expression at that step.
    """
    initial = F.col(target) if (initial_from_target and target in df.columns) else None
    expr = initial if initial is not None else F.lit(None).cast("string")

    extra_exprs: dict[str, Column] = {c: F.col(c) for r in rules for c in r.extra_assignments}
    for rule in rules:
        fire = rule.fire_condition(expr)
        for col_name, value in rule.extra_assignments.items():
            extra_exprs[col_name] = F.when(fire, value).otherwise(extra_exprs[col_name])
        if rule.message is not None:
            expr = F.when(fire, F.lit(rule.message)).otherwise(expr)

    out = df
    for col_name, e in extra_exprs.items():
        out = out.withColumn(col_name, e)
    return out.withColumn(target, expr)


def rules_from_config(config: Sequence[dict]) -> list[Rule]:
    """Build a cascade from a JSON/YAML-style config — the analyst
    surface: rules as data, not code.

    Each entry: ``{"id": str, "when": <SQL predicate>, "message": str,
    "guard": "if_null" | "always" | "sentinel", "sentinel": str?}``.
    The SQL predicate string serves BOTH sides: ``F.expr`` compiles it
    for Spark and it is reused verbatim as ``condition_sql`` for the
    oracle — so a config-defined cascade is DuckDB-verifiable by
    construction (the predicate must stay in the ANSI subset both
    engines parse; the reference's rule conditions all do).

    The reference hard-codes its ~34 rules in Python (SURVEY.md §2.8);
    this is what its maintainers would actually want: edit a config,
    not a script.
    """
    out: list[Rule] = []
    for entry in config:
        guard = Guard(entry.get("guard", "if_null"))
        out.append(
            Rule(
                rule_id=entry["id"],
                # lazy: F.expr needs an active SparkContext, and configs
                # load at import/parse time; the callable form defers
                # expression construction to apply time.
                condition=(lambda _running, _w=entry["when"]: F.expr(_w)),
                message=entry.get("message"),
                guard=guard,
                sentinel=entry.get("sentinel"),
                condition_sql=entry["when"],
            )
        )
    return out
