"""Repo-wide structural guard against the whole-partition corpus-window
class (r11, VERDICT r10 ask #2 — "a sweep ends it").

Three rounds in a row a catalog query landed a Window partitioned by a
LOW-CARDINALITY corpus column (lang: 3-5 values, source: 20, epoch: 2,
event_type: 5) over a corpus-shaped child — each language/source/type
partition is a corpus share funneled through ONE window task at any
scale.  r9 flagged two, r10 fixed those two and six more sat one grep
away, r11 routed all of them plus three the sweep itself found
(docs_name_collision, events_median_value, events_mad_outliers).  This
test walks the OPTIMIZED logical plan of EVERY catalog query, with every
skew-routed query forced onto its at-scale decomposed branch, and fails
on any unrouted offender — so the class cannot regrow.

A Window partitioned only by bad keys is acceptable exactly when:

* it is WindowGroupLimit-protected (top-k: the optimizer bounds each
  partition map-side — docs_domain_caps' per-source rank(15));
* its input is a SALT-CELL table: descending through unary nodes
  reaches an Aggregate whose grouping contains a ``_salt``/``salt``
  column (the operators/skew.py decomposition offsets — ≤ keys × cells
  rows by construction, never corpus-shaped).  The salt name is the
  repo-wide salting convention (operators/skew.py, plans/urls.py);
* it is whitelisted below with a reason (K-row constant-table windows).

Known blind spot: an eager ``localCheckpoint`` at plan-build time
(operators/shards.py assign_shards) truncates the visible plan — windows
upstream of the checkpoint are invisible here.  Those paths carry their
own routing guards and plan pins (tests/test_plan_shapes.py).
"""

from __future__ import annotations

import inspect

import pytest

#: low-cardinality corpus columns: a Window partitioned ONLY by these is
#: a corpus-through-one-task plan unless protected/blessed.
#: export_group is `source` RENAMED (plans/media.py) — the sweep sees
#: attribute names, not lineage, so known aliases of bad keys must be
#: listed explicitly.  `k` rides along only in combination (export_group,
#: k) via the subset rule.
BAD_KEYS = {"lang", "source", "epoch", "event_type", "export_group", "k"}

#: (query, partition-tuple) -> reason, for windows the rules above can't
#: see are bounded.  Keep EMPTY unless a genuinely K-row case appears —
#: every entry here is a scale judgment someone must re-check.
ALLOW: dict[tuple[str, tuple[str, ...]], str] = {}

_SF = "/root/testdata/sf0.001"


def _names(exprs) -> tuple[str, ...]:
    out = []
    for i in range(exprs.size()):
        out.append(exprs.apply(i).toString().split("#")[0].strip())
    return tuple(sorted(out))


_UNARY_PASS = {
    "Project",
    "Filter",
    "Sort",
    "Repartition",
    "RepartitionByExpression",
    "ResolvedHint",
    "Window",
    "WithCTE",
}


def _salt_cell_blessed(win_node) -> bool:
    """Descend through unary nodes; True iff the first structural node
    found is EITHER a WindowGroupLimit (the optimizer bounded THIS
    window's partitions map-side — protection must be node-local: a
    plan-global check by partition tuple let one protected top-k window
    exonerate unprotected corpus windows on the same key elsewhere in
    the plan, which is exactly how events_quantile_sketch's exact branch
    slipped through) OR an Aggregate grouping by a salt column (the
    skew-decomposition cell table)."""
    node = win_node
    while True:
        ch = node.children()
        if ch.size() != 1:
            return False
        node = ch.apply(0)
        cls = node.getClass().getSimpleName()
        if cls == "WindowGroupLimit":
            return True
        if cls == "Aggregate":
            g = _names(node.groupingExpressions())
            return any(n in ("_salt", "salt") for n in g)
        if cls not in _UNARY_PASS:
            return False


def _violations(df) -> list[tuple[str, ...]]:
    plan = df._jdf.queryExecution().optimizedPlan()
    wins = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            wins.append((_names(node.partitionSpec()), node))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    bad = []
    for names, node in wins:
        if not names or not set(names) <= BAD_KEYS:
            continue
        if _salt_cell_blessed(node):
            continue
        bad.append(names)
    return bad


@pytest.mark.timeout(1200)
def test_no_unrouted_corpus_windows_on_low_card_keys(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    failures = {}
    errors = {}
    for name, fn in sorted(mod.queries().items()):
        kwargs = {}
        try:
            if "_route" in inspect.signature(fn).parameters:
                # force the decomposed (at-scale) branch: the sweep must
                # see the plan a 100 TB corpus would run
                kwargs["_route"] = 10**9
            df = fn(spark, _SF, **kwargs)
            bad = _violations(df)
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            errors[name] = repr(e)[:200]
            continue
        bad = [b for b in bad if (name, b) not in ALLOW]
        if bad:
            failures[name] = bad
    # the decomposed branches cache() their narrow pre-rank frames;
    # CacheManager dedupes by canonicalized plan ACROSS tests, so leave
    # no entries behind (a later plain-branch plan pin would otherwise
    # see InMemoryRelation where it asserts the raw exchange shape)
    spark.catalog.clearCache()
    assert not errors, f"queries failed to build a plan: {errors}"
    assert not failures, (
        "unrouted corpus windows on low-cardinality keys (route through "
        f"operators/skew.py salted_* or whitelist with a reason): {failures}"
    )
