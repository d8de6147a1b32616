"""Public Suffix List rules for registered-domain extraction.

Parses the vendored Mozilla Public Suffix List
(``etl_batch_spark/data/public_suffix_list.dat``, MPL-2.0, obtained
from https://publicsuffix.org/list/ — public data, the header in the
file carries the license) into the three rule classes the PSL
algorithm (https://publicsuffix.org/list/) needs:

- **exact** rules — ``co.uk`` — the suffix is the rule itself;
- **wildcard** rules — ``*.ck`` — stored as their PARENT (``ck``): any
  single extra label under the parent is a public suffix;
- **exception** rules — ``!www.ck`` — stored without the ``!``: the
  rule itself is NOT a public suffix, and is therefore exactly the
  registrable domain for any host ending in it.

The sets are small (≈9.4k exact / ≈110 wildcard parents / 8
exceptions) and loaded once per process; ``llmops.text.
registered_domain`` turns them into native ``isin`` predicates that
Catalyst compiles to ``InSet`` hash probes — O(1) per row, JVM-side,
no join and no Python in the data plane.

Matching is performed on the Unicode form exactly as published in the
list (the PSL convention); Punycode (``xn--``) hosts fall under the
default ``*`` rule unless their ASCII form appears verbatim.  IDNA
conversion is the ingest pipeline's job, not the engine's.
"""

from __future__ import annotations

import os
from functools import lru_cache

_DAT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "public_suffix_list.dat",
)

# deepest rule shapes in the published list: 5-label exact rules and
# 4-label wildcard parents (so wildcard-matched suffixes reach 5
# labels).  Asserted at load so a refreshed list that grows deeper
# fails loudly instead of silently under-matching.
MAX_SUFFIX_LABELS = 5


@lru_cache(maxsize=1)
def load_rules() -> "tuple[frozenset[str], frozenset[str], frozenset[str]]":
    """(exact, wildcard_parents, exceptions) from the vendored list."""
    exact: "set[str]" = set()
    wild: "set[str]" = set()
    exc: "set[str]" = set()
    with open(_DAT, encoding="utf-8") as f:
        for line in f:
            # per the PSL format spec, everything after whitespace and
            # any ``//`` comment line is ignored
            rule = line.strip().split()[0] if line.strip() else ""
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                exc.add(rule[1:])
            elif rule.startswith("*."):
                wild.add(rule[2:])
            else:
                exact.add(rule)
    deepest = max(
        max(r.count(".") + 1 for r in exact),
        max(r.count(".") + 2 for r in wild),  # +1 for the '*' label
        max(r.count(".") + 1 for r in exc),
    )
    if deepest > MAX_SUFFIX_LABELS:
        raise ValueError(
            f"public suffix list contains {deepest}-label rules; raise "
            f"MAX_SUFFIX_LABELS (currently {MAX_SUFFIX_LABELS}) so "
            "registered_domain keeps matching the deepest rules"
        )
    return frozenset(exact), frozenset(wild), frozenset(exc)


# -- cached IN-set construction ---------------------------------------------
#
# ``col.isin(*9_400 strings)`` costs ~4 s of per-literal py4j round
# trips EVERY time the expression is built — ruinous for a function
# called once per query build (bench rebuilds per run; the corpus
# matrix builds 39×).  The JVM literal sequence is immutable, so build
# it once per (rule set, SparkContext) and reuse: subsequent builds are
# a single py4j call.  Runtime is unchanged either way — Catalyst's
# OptimizeIn rewrites the 9.4k-literal In to an InSet hash probe.

_SEQ_CACHE: "dict[tuple, object]" = {}


def rules_in(col, which: str):
    """``col IN <rule set>`` as a Column (which ∈ exact|wild|exc)."""
    exact, wild, exc = load_rules()
    rules = sorted({"exact": exact, "wild": wild, "exc": exc}[which])
    try:
        from pyspark.sql.classic.column import (
            Column as _Col,
            _create_column_from_literal,
            _to_seq,
        )
        from pyspark.sql.utils import get_active_spark_context
    except ImportError:  # pragma: no cover — Connect-only environments
        return col.isin(rules)
    sc = get_active_spark_context()
    # stable context identity: id(sc._jsc) can be REUSED by CPython for
    # a new context's wrapper after the old one is GC'd, handing back a
    # JVM sequence from a stopped gateway.  applicationId + startTime
    # survive wrapper churn and differ across restarts.
    try:
        key = (which, sc.applicationId, sc.startTime)
    except Exception:  # stopped context mid-teardown — skip the cache
        return col.isin(rules)
    seq = _SEQ_CACHE.get(key)
    if seq is None:
        seq = _to_seq(sc, [_create_column_from_literal(r) for r in rules])
        for k in [k for k in _SEQ_CACHE if k[1:] != key[1:]]:
            del _SEQ_CACHE[k]  # entries from dead contexts are useless
        _SEQ_CACHE[key] = seq
    return _Col(col._jc.isin(seq))
