"""Source fingerprints for code-change-aware driver rotation.

Round-11 verdict item 2: the driver's bounded check window rotated on
staleness alone, so a query whose Spark or oracle leg was MODIFIED
after its last driver green waited its staleness turn (up to 5 rounds)
before the driver re-verified the changed code. The fix is a per-query
content hash recorded at the code state the driver last greened
(``QUERY_HASHES.json``, maintained by ``tools/query_hashes.py``); the
registry compares it against the CURRENT fingerprint and promotes
mismatches into a rotation tier between "never verified" and
"stalest green".

The fingerprint must change when the query's behavior might have:
:func:`query_fingerprint` hashes the query function's source PLUS the
sources of every package-local function/class it transitively
references (through globals, closure cells, defaults, ``mod.attr``
access, and nested code objects), plus the oracle SQL. A fix deep in
``operators/forecast.py`` therefore re-fingerprints every forecast
query even though the registered query functions themselves did not
change. False positives (a comment edit re-flags a query) only cost
one early driver recheck — the safe direction.

STDLIB-ONLY module by design: ``tools/query_hashes.py`` loads this
file standalone (``importlib.util.spec_from_file_location``) and
applies it to registries imported from historical git worktrees, so it
must not import pyspark or any package sibling at module level.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import types

PKG_PREFIX = "steam_data_pipeline_spark"

# (module, qualname) -> source text; valid within one code state (one
# process), which is how both the registry and the snapshot tool run.
_SOURCE_CACHE: dict[tuple[str, str], str] = {}


def _source_of(obj, key: tuple[str, str]) -> str:
    if key in _SOURCE_CACHE:
        return _SOURCE_CACHE[key]
    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):  # builtins / exec'd code: stable token
        src = f"<nosource:{key[0]}:{key[1]}>"
    _SOURCE_CACHE[key] = src
    return src


def _code_names(code: types.CodeType) -> set[str]:
    """Global names referenced by a code object and every code object
    nested inside it (comprehensions, lambdas, inner defs)."""
    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _walk(obj, out: dict[tuple[str, str], str]) -> None:
    """Record the source of ``obj`` (if package-local) and recurse into
    everything it references that is also package-local."""
    while isinstance(obj, functools.partial):
        for a in obj.args:
            _walk(a, out)
        for a in obj.keywords.values():
            _walk(a, out)
        obj = obj.func
    if inspect.ismethod(obj):
        obj = obj.__func__
    if inspect.isfunction(obj):
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith(PKG_PREFIX):
            return
        key = (mod, obj.__qualname__)
        if key in out:
            return
        out[key] = _source_of(obj, key)
        names = _code_names(obj.__code__)
        g = obj.__globals__
        for name in sorted(names):
            if name in g:
                _resolve(g[name], names, out)
        for cell in obj.__closure__ or ():
            try:
                v = cell.cell_contents
            except ValueError:  # pragma: no cover - unfilled cell
                continue
            _walk(v, out)
        for d in obj.__defaults__ or ():
            _walk(d, out)
        for d in (obj.__kwdefaults__ or {}).values():
            _walk(d, out)
    elif inspect.isclass(obj):
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith(PKG_PREFIX):
            return
        key = (mod, obj.__qualname__)
        if key in out:
            return
        out[key] = _source_of(obj, key)
        for v in vars(obj).values():
            if isinstance(v, (staticmethod, classmethod)):
                v = v.__func__
            if inspect.isfunction(v):
                _walk(v, out)  # records method refs (source dup is harmless)
    elif not inspect.ismodule(obj):
        # wrapper objects (pyspark UserDefinedFunction, @udtf handles):
        # follow the conventional .func attribute to the Python callable
        inner = getattr(obj, "func", None)
        if inner is not None and inner is not obj and callable(inner):
            _walk(inner, out)


def _resolve(v, names: set[str], out: dict[tuple[str, str], str]) -> None:
    """A referenced global: walk it directly, or — for a package-local
    module accessed as ``mod.attr`` — walk every referenced attribute
    name that resolves on it (co_names lists 'mod' and 'attr'
    separately, so this recovers the attribute accesses)."""
    if inspect.ismodule(v):
        if (getattr(v, "__name__", "") or "").startswith(PKG_PREFIX):
            for name in sorted(names):
                a = getattr(v, name, None)
                if a is not None and (
                    inspect.isfunction(a) or inspect.isclass(a)
                ):
                    _walk(a, out)
    else:
        _walk(v, out)


def query_fingerprint(spark_fn, oracle: str | None) -> str:
    """Deterministic hex digest of a query's Spark leg (transitive
    package-local source closure) and oracle SQL."""
    out: dict[tuple[str, str], str] = {}
    _walk(spark_fn, out)
    h = hashlib.sha256()
    for (mod, qual) in sorted(out):
        h.update(f"{mod}:{qual}\n".encode("utf-8", "replace"))
        h.update(out[(mod, qual)].encode("utf-8", "replace"))
        h.update(b"\x00")
    h.update(b"\x01")
    h.update((oracle or "").encode("utf-8", "replace"))
    return h.hexdigest()
