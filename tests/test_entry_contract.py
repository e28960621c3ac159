"""Driver-contract shape guards for __spark_entry__.py.

The driver value-compares the FIRST 50 entries of ``queries()`` against
``oracle_sql()`` each round, and the per-round rotation is hand-edited —
these tests make the two failure modes of that editing loud:

* a duplicated key in the ``queries()`` dict literal silently collapses
  (last one wins) and quietly shrinks the 50-entry gate by one slot;
* an ``oracle_sql()`` key with no matching ``queries()`` entry (or a
  query whose oracle was dropped in an edit) downgrades the driver's
  check for that query without anyone deciding that.
"""

import ast
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _literal_keys(func_name):
    """String keys of the dict literal returned by ``func_name``, read
    from SOURCE (the runtime dict silently collapses duplicates)."""
    tree = ast.parse(open(ENTRY).read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == func_name)
    ret = next(n for n in ast.walk(fn) if isinstance(n, ast.Return))
    assert isinstance(ret.value, ast.Dict)
    return [k.value for k in ret.value.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)]


def test_queries_dict_has_no_duplicate_keys():
    keys = _literal_keys("queries")
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"rotation edit left duplicate queries() keys: {dupes}"


def test_gate_head_is_full():
    # the driver checks exactly the first 50 entries; fewer total
    # entries than 50 would under-fill the gate
    assert len(_literal_keys("queries")) >= 50


def test_oracle_keys_subset_of_queries():
    mod = _load_entry()
    q = set(mod.queries().keys())
    o = set(mod.oracle_sql().keys())
    assert o <= q, f"oracle_sql keys with no queries() entry: {o - q}"
    # non-SQL-expressible entries may legitimately omit an oracle, but
    # a LARGE gap means an editing accident, not a policy choice
    assert len(q - o) <= 5, f"queries() without oracles: {sorted(q - o)}"
