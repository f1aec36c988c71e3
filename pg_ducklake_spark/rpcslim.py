"""Driver-side py4j RPC slimming for classic-mode PySpark.

Plan construction in classic PySpark is pure py4j control-channel
traffic, and on this sandbox each round trip costs ~0.3-0.5 ms (a
userspace-proxied loopback; see session._enable_py4j_nodelay). Counting
``send_command`` calls per query build (tools/profile_build.py) showed
340-1500 RPCs per headline-query build — the bench's plan_build_sec is
almost entirely this traffic. Three upstream client inefficiencies
dominate, none of them semantic:

1. ``F.<fn>`` resolves ``sc._jvm -> functions -> <fn>`` on EVERY call:
   one JVMView reflection RPC + one JavaClass member-reflection RPC
   before the actual invocation (py4j caches neither). But py4j's own
   ``JavaObject.__getattr__`` proves the lookup is optional: with
   ``auto_field`` off it fabricates ``JavaMember`` objects locally and
   lets the invocation itself surface missing members. We do the same
   for the static ``org.apache.spark.sql.functions`` members: fabricate
   the JavaMember once per (JVM view, name) and cache it — 3 RPCs -> 1
   per function call, identical invocation command on the wire.

2. ``_to_seq``/``_to_list`` auto-convert the Python list through
   py4j's ListConverter: ``new ArrayList()`` + one ``add`` RPC PER
   ELEMENT, then a ``PythonUtils.toSeq`` lookup+call (2 more RPCs).
   ``PythonUtils.toSeq/toList`` copy into immutable Scala collections
   (``vs.asScala.toSeq``), so the intermediate java list is never
   retained or mutated — batching its construction through
   ``java.util.List.of(...)`` (fixed-arity overloads up to 10 args; one
   RPC per 10 elements) is observationally identical. Lists containing
   None fall back to the stock path (``List.of`` rejects nulls).
   py4j's global ListConverter is left untouched — only Spark's own
   known-read-only toSeq/toList call sites use the batch.

3. Same 2-RPC resolve chain for the column helpers
   (``_create_column_from_name``/``_create_column_from_literal``/
   ``_func_op``) in ``pyspark.sql.classic.column``.

Everything here changes the NUMBER of wire commands, never their
semantics; every patch falls back to the stock implementation on any
structural surprise. Results are byte-identical — verified by the full
oracle sweep + pytest. A fourth, orthogonal lever lives in session.py:
``spark.python.sql.dataFrameDebugging.enabled=false`` (upstream conf),
which stops ``_with_origin`` from doing ~8 extra RPCs per DataFrame/
Column API call for error-message call-site capture.
"""

from __future__ import annotations

from typing import Any

_INSTALLED = False

_FUNCTIONS_FQN = "org.apache.spark.sql.functions"


def _view_cache(view) -> dict:
    """Per-JVMView cache dict (instance attrs win over __getattr__)."""
    cache = view.__dict__.get("_graft_rpc_cache")
    if cache is None:
        cache = {}
        view.__dict__["_graft_rpc_cache"] = cache
    return cache


def _static_member(view, fqn: str, name: str):
    """Fabricate (and cache) a JavaMember for a static method.

    Mirrors what ``JavaClass.__getattr__`` returns after its reflection
    round trip, minus the round trip: py4j encodes static targets as
    ``z:<fqn>`` and validates the member at invocation time anyway.
    """
    from py4j import protocol as proto
    from py4j.java_gateway import JavaMember

    cache = _view_cache(view)
    key = (fqn, name)
    member = cache.get(key)
    if member is None:
        member = JavaMember(
            name, None, proto.STATIC_PREFIX + fqn, view._gateway_client
        )
        cache[key] = member
    return member


def _batched_java_list(sc, elems: list) -> Any | None:
    """Build a java.util.List from ``elems`` in ~len/10 RPCs.

    Returns None when the batch path does not apply (empty list, None
    elements) — callers fall back to stock py4j conversion. The result
    may be immutable (List.of); only pass it to JVM methods that copy,
    e.g. PythonUtils.toSeq/toList.
    """
    n = len(elems)
    if n == 0 or any(e is None for e in elems):
        return None
    view = sc._jvm
    list_of = _static_member(view, "java.util.List", "of")
    first = list_of(*elems[:10])
    if n <= 10:
        return first
    # >10 elements: mutable ArrayList seeded with the first chunk, then
    # addAll per further chunk (JavaObject member lookups are RPC-free).
    from py4j.java_gateway import JavaClass

    out = JavaClass("java.util.ArrayList", view._gateway_client)(first)
    for i in range(10, n, 10):
        out.addAll(list_of(*elems[i : i + 10]))
    return out


# PySpark minor versions whose private internals these patches were
# written and verified against. On any other version install() warns
# and skips, so an upgrade degrades VISIBLY to stock behavior instead
# of silently (ADVICE r12) — the patched names are private
# (pyspark.sql.classic.*, functions.builtin._get_jvm_function) and may
# move between minors.
_SUPPORTED_PYSPARK = ("4.1",)


def install() -> None:
    """Apply the RPC-slimming patches (idempotent, classic mode only)."""
    global _INSTALLED
    if _INSTALLED:
        return
    _INSTALLED = True
    try:
        import pyspark

        ver = pyspark.__version__
    except Exception:
        return
    if not any(ver.startswith(p + ".") or ver == p for p in _SUPPORTED_PYSPARK):
        import warnings

        warnings.warn(
            f"pg_ducklake_spark.rpcslim: PySpark {ver} is outside the "
            f"verified range {_SUPPORTED_PYSPARK}; skipping RPC-slimming "
            "patches (stock client behavior, correct but chattier).",
            RuntimeWarning,
            stacklevel=2,
        )
        return
    _patch_get_jvm_function()
    _patch_to_seq_to_list()
    _patch_column_helpers()


def _patch_get_jvm_function() -> None:
    try:
        import pyspark.sql.functions.builtin as _builtin

        _orig = _builtin._get_jvm_function

        def _get_jvm_function(name: str, sc):
            try:
                return _static_member(sc._jvm, _FUNCTIONS_FQN, name)
            except Exception:
                return _orig(name, sc)

        _builtin._get_jvm_function = _get_jvm_function
    except Exception:
        pass


def _patch_to_seq_to_list() -> None:
    try:
        import pyspark.sql.classic.column as _cc
        import pyspark.sql.classic.dataframe as _cdf

        _orig_to_seq = _cc._to_seq
        _orig_to_list = _cc._to_list

        def _to_seq(sc, cols, converter=None):
            elems = [converter(c) for c in cols] if converter else list(cols)
            try:
                jlist = _batched_java_list(sc, elems)
                if jlist is None:
                    return _orig_to_seq(sc, elems)
                return _static_member(
                    sc._jvm, "org.apache.spark.api.python.PythonUtils", "toSeq"
                )(jlist)
            except Exception:
                return _orig_to_seq(sc, elems)

        def _to_list(sc, cols, converter=None):
            elems = [converter(c) for c in cols] if converter else list(cols)
            try:
                jlist = _batched_java_list(sc, elems)
                if jlist is None:
                    return _orig_to_list(sc, elems)
                return _static_member(
                    sc._jvm, "org.apache.spark.api.python.PythonUtils", "toList"
                )(jlist)
            except Exception:
                return _orig_to_list(sc, elems)

        _cc._to_seq = _to_seq
        _cc._to_list = _to_list
        # classic.dataframe binds them at import time; rebind.
        _cdf._to_seq = _to_seq
        _cdf._to_list = _to_list
    except Exception:
        pass


def _patch_column_helpers() -> None:
    try:
        import pyspark.sql.classic.column as _cc
        from pyspark.sql.utils import enum_to_value, get_active_spark_context

        _orig_from_name = _cc._create_column_from_name
        _orig_from_literal = _cc._create_column_from_literal
        _orig_func_op = _cc._func_op

        def _create_column_from_name(name):
            try:
                sc = get_active_spark_context()
                return _static_member(sc._jvm, _FUNCTIONS_FQN, "col")(name)
            except Exception:
                return _orig_from_name(name)

        def _create_column_from_literal(literal):
            try:
                sc = get_active_spark_context()
                return _static_member(sc._jvm, _FUNCTIONS_FQN, "lit")(
                    enum_to_value(literal)
                )
            except Exception:
                return _orig_from_literal(literal)

        def _func_op(name, self):
            try:
                sc = get_active_spark_context()
                jc = _static_member(sc._jvm, _FUNCTIONS_FQN, name)(self._jc)
                return _cc.Column(jc)
            except Exception:
                return _orig_func_op(name, self)

        _cc._create_column_from_name = _create_column_from_name
        _cc._create_column_from_literal = _create_column_from_literal
        _cc._func_op = _func_op
    except Exception:
        pass
