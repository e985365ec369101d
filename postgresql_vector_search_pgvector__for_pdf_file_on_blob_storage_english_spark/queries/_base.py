"""Query registry: every implemented operator from SURVEY.md §2 as a
(PySpark callable, DuckDB oracle SQL) pair over the driver's parquet
fixtures.

Conventions that make the driver's order-insensitive value-hash gate
pass deterministically:

* every computed column is aliased identically on both sides;
* every floating-point *computation* is rounded (round(x, 4) for
  distances/ratios, round(x, 2) for money sums) on both sides —
  double accumulation order across engines/partitionings differs in
  ulps, rounding makes the comparison well-defined;
* distance math is done in DOUBLE on both sides (the storage type is
  float4, matching pgvector);
* top-k cutoffs order by the *unrounded* value with an id tiebreak, so
  both engines select the same winner set;
* timestamps are emitted as formatted strings, never raw timestamps.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import normalize_whitespace_col, split_chunks_pandas_udf
from ..functions.vector import DISTANCE_FNS
from ..operators.knn import knn, knn_join
from ..operators.status import STATUS_VALUES

Entry = tuple[Callable[[SparkSession, str], DataFrame], str | None]
REGISTRY: dict[str, Entry] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    REGISTRY[name] = (fn, sql)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# r14 (VERDICT r13 item 9): scale-conditional lineage pins.  Several
# r13 pin experiments measured SLOWER at sf0.1 (the checkpoint
# materialization + lost pipeline fusion cost more than the re-derived
# corpus passes they remove) but invert once the source is large
# enough that a full tokenize/scan pass dominates.  The guard derives
# from the DATA — the source table's on-disk bytes — not from a core
# count or an env profile, so both branches compute identical results
# and the plan adapts to the input: small fixtures keep the fused
# plain-branch plan, big corpora pin.  Threshold overridable via
# SPARK_GRAFT_PIN_SRC_BYTES (default 256 MB — ~40x the sf0.1 documents
# table and ~4x its 10x replica, safely past every measured
# crossover); a non-local source path (object store) returns None size
# and pins, the right default where corpus passes are the cost.
import os as _os

_PIN_SRC_BYTES = int(_os.environ.get("SPARK_GRAFT_PIN_SRC_BYTES", str(256 * 1024**2)))


def _src_bytes(sf_dir: str, name: str) -> int | None:
    p = f"{sf_dir}/{name}.parquet"
    try:
        if _os.path.isfile(p):
            return _os.path.getsize(p)
        if _os.path.isdir(p):
            return sum(
                _os.path.getsize(_os.path.join(root, f))
                for root, _dirs, files in _os.walk(p)
                for f in files
            )
    except OSError:
        return None
    return None


def _pin_if_large(sf_dir: str, name: str) -> Callable[[DataFrame], DataFrame]:
    """Return a pin function: lazy localCheckpoint when the source
    table ``name`` under ``sf_dir`` is large (or its size is unknown),
    identity otherwise.  Pins never change results — only whether a
    multi-consumer relation is re-derived per branch."""
    b = _src_bytes(sf_dir, name)
    if b is None or b >= _PIN_SRC_BYTES:
        return lambda df: df.localCheckpoint(eager=False)
    return lambda df: df


def _drain(q, timeout: int) -> None:
    """Await a replay query's drain and FAIL LOUDLY on timeout: a
    silently partial log folds into a wrong-but-plausible result
    (ADVICE r6 — awaitTermination's boolean was being ignored)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"streaming drain exceeded {timeout}s; refusing to fold a partial log"
        )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark 4 refuses to read natively — the legacy conf reads it as a
    nanos long we truncate to microseconds, matching DuckDB's ns->us
    truncation) and plain TIMESTAMP(MICROS) (read natively).  Branch on
    the decoded type so either fixture vintage works."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(ev.schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        # Micros vintage decodes as TIMESTAMP_NTZ; downstream expressions
        # (unix_micros, cast to bigint) expect TIMESTAMP_LTZ like the nanos
        # branch produces.  Session tz is pinned UTC above, so this cast is
        # a pure re-tag, not a wall-clock shift.
        ev = ev.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return ev


# --------------------------------------------------------------------------
# DuckDB-side expression fragments (the portable twins of functions/vector.py
# and functions/text.py).  `a`/`b` are FLOAT[] columns.
# --------------------------------------------------------------------------

def _dd_l2sq(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
    )


def _dd_l2(a: str, b: str) -> str:
    return f"sqrt({_dd_l2sq(a, b)})"


def _dd_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _dd_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"


def _dd_cosine_dist(a: str, b: str) -> str:
    return f"(1.0 - {_dd_dot(a, b)} / ({_dd_norm(a)} * {_dd_norm(b)}))"


_DD_MARKER_RE = re.compile(r"\{(\w+)\}")


def dd_sql(template: str, **subs: object) -> str:
    """Brace-safe SQL template substitution (VERDICT r3 item 3).

    ``str.format`` re-parses EVERY brace in the template, so a composed
    fragment containing e.g. the regex ``\\s{2,}`` crashes a later
    format pass with ``KeyError: '2,'`` — the bug that bricked round 3
    (queries.py:3565).  This is a SINGLE regex pass over the original
    template (ADVICE r4): substituted values are never re-scanned, so a
    value containing a sibling key's ``{marker}`` stays inert — unlike
    the earlier sequential ``str.replace`` loop, where a later key could
    rewrite text a previous substitution had just inserted.  Non-marker
    braces (regex quantifiers ``{2,}``, bare ``{3}``) don't collide:
    they either fail the ``\\w+`` shape or miss the subs dict and are
    left untouched.
    """
    unused = set(subs)

    def _repl(m: re.Match[str]) -> str:
        key = m.group(1)
        if key in subs:
            unused.discard(key)
            return str(subs[key])
        return m.group(0)

    out = _DD_MARKER_RE.sub(_repl, template)
    if unused:
        raise KeyError(f"dd_sql: no {{{'}/{'.join(sorted(unused))}}} marker in template")
    return out


# NOTE: single-braced regex quantifier {2,} is fine here — dd_sql never
# re-parses it (str.format would need {{2,}} and still poison later passes).
_DD_NORMALIZE = (
    "regexp_replace(regexp_replace({col}, '\\n', ' ', 'g'), '\\s{2,}', ' ', 'g')"
)


