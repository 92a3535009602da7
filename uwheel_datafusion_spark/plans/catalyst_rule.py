"""Catalyst-visible wheel rewrite — the JVM optimizer-rule front end.

Round 13 (SURVEY §7.6 / VERDICT r12 next #10 stretch): the library
router (plans/sql_router.py) intercepts SQL STRINGS; this module
injects a REAL ``Rule[LogicalPlan]`` (catalyst_ext/WheelRollupRewrite
.java) into the session's optimizer, so any logical plan — from
spark.sql, a DataFrame chain, a JDBC/notebook client planning through
this session — of the shape::

    Aggregate [SUM(value)] <- Filter(ts >= L1 AND ts < L2) <- fact

with slot-aligned literals is rewritten onto the MATERIALIZED minute
rollup (a dt-partitioned parquet table — WheelIndex.save's layout),
and the fact table is never scanned. This is where datafusion-uwheel
itself sits (a logical-plan rewrite inside the engine's optimizer);
the regex router remains the general fallback for the grouped / keyed
/ sketch rewrites.

Compilation is ON DEMAND (javac ships with the JDK the container
already has; the compiled classes are cached next to the source and
loaded through a URLClassLoader into the running JVM), and
registration goes through ``ExperimentalMethods.extraOptimizations``
— the runtime twin of a ``spark.sql.extensions`` injectOptimizerRule
(same Rule class; the config route needs the class on the driver
classpath at session build, which a library cannot assume).

Numeric note: the rewritten plan sums the rollup's per-minute DOUBLE
sums (sum_micros/1e6), so the result can differ from the raw-row
float sum in the last ulp — same as any pre-aggregated serving layer;
the exact-integer serving paths (driver index, scaled-long gates)
remain the bit-exact surface. The rule bails to the scan on ANY shape
it cannot prove: grouping, non-SUM aggregates, DISTINCT/FILTER
clauses, unaligned endpoints, references beyond {ts, value}.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "catalyst_ext",
    "WheelRollupRewrite.java",
)
def _classdir() -> str:
    # keyed by the Spark version: classes compiled against one
    # installation must never be injected into a JVM running another
    # (a binary-incompatible Catalyst change would surface as
    # NoSuchMethodError at optimization time of arbitrary queries)
    import pyspark

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "catalyst_ext",
        f"_classes-spark{pyspark.__version__}",
    )


_CLASSNAME = "WheelRollupRewrite"

#: per-JVM install state: {gateway id: (cls, rule instance, prior seq)}
#: — install() composes (one loaded class, one injected instance, many
#: register() calls) instead of clobbering extraOptimizations per call
_STATE: dict = {}


def javac_available() -> bool:
    from shutil import which

    return which("javac") is not None


def ensure_compiled() -> str:
    """Compile the rule against the session's own Spark jars (cached
    per Spark version — recompiles when the source is newer than the
    classfile)."""
    classdir = _classdir()
    cls_file = os.path.join(classdir, f"{_CLASSNAME}.class")
    if os.path.exists(cls_file) and os.path.getmtime(
        cls_file
    ) >= os.path.getmtime(_SRC):
        return classdir
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = ":".join(
        os.path.join(jars, j) for j in sorted(os.listdir(jars))
        if j.endswith(".jar")
    )
    os.makedirs(classdir, exist_ok=True)
    subprocess.run(
        [
            "javac", "-nowarn", "-encoding", "UTF-8",
            "-cp", cp, "-d", classdir, _SRC,
        ],
        check=True,
        capture_output=True,
    )
    return classdir


def _load_rule_class(spark: SparkSession):
    """Load the compiled class into the RUNNING JVM via a
    URLClassLoader child of the system loader (parent-first, so the
    Spark classes it references resolve to the session's own)."""
    jvm = spark._jvm
    url = jvm.java.net.URL(f"file://{ensure_compiled()}/")
    urls = jvm.java.lang.reflect.Array.newInstance(
        jvm.java.lang.Class.forName("java.net.URL"), 1
    )
    jvm.java.lang.reflect.Array.set(urls, 0, url)
    loader = jvm.java.net.URLClassLoader.newInstance(urls)
    return loader.loadClass(_CLASSNAME)


def install(
    spark: SparkSession,
    fact_view: str,
    rollup_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    gran_ms: int = 60_000,
):
    """Register the rewrite for ``fact_view`` (a temp view whose plan
    carries stable ts/value ExprIds) onto ``rollup_df`` (the
    MATERIALIZED minute rollup — (bucket_ms, sum_micros, ...) read
    from WheelIndex.save's parquet; passing the in-memory groupBy
    lineage would re-scan the fact per query, defeating the point),
    then inject the rule into the session optimizer. COMPOSES: one
    loaded class + one injected instance per JVM, any number of
    registered tables (a second install() must not clobber the first
    registration or a foreign library's extraOptimizations). Returns
    the loaded rule class (for clear()/registeredCount() in tests)."""
    # UTC contract (code-review r13 #1): the rollup's dt partitions
    # were written with session-tz date_format, the view's ts rides a
    # session-tz cast, and the rule's day-bound arithmetic is UTC —
    # under any other session timezone the rewrite would fire and
    # silently prune the wrong day partitions. Refuse loudly; the
    # engine pins UTC at table registration (sources.registry).
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"catalyst_rule.install requires spark.sql.session.timeZone="
            f"'UTC' (found {tz!r}): the rollup layout, the NTZ view cast "
            "and the rule's day-bound pruning all assume UTC epoch days"
        )
    jvm = spark._jvm
    key = id(spark.sparkContext._gateway)
    state = _STATE.get(key)
    cls = state[0] if state else _load_rule_class(spark)

    out = spark.table(fact_view)._jdf.queryExecution().analyzed().output()
    ids = {}
    it = out.iterator()
    while it.hasNext():
        a = it.next()
        ids[a.name()] = a.exprId().id()
    ts_id, value_id = ids[ts_col], ids[value_col]

    view = rollup_df.select(
        F.timestamp_millis(F.col("bucket_ms"))
        .cast("timestamp_ntz")
        .alias(ts_col),
        (F.col("sum_micros").cast("double") / F.lit(1e6)).alias(value_col),
    )
    jplan = view._jdf.queryExecution().optimizedPlan()

    long_t = jvm.java.lang.Long.TYPE
    plan_cls = jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.LogicalPlan"
    )
    sig = jvm.java.lang.reflect.Array.newInstance(
        jvm.java.lang.Class.forName("java.lang.Class"), 4
    )
    for i, c in enumerate((long_t, long_t, long_t, plan_cls)):
        jvm.java.lang.reflect.Array.set(sig, i, c)
    m = cls.getMethod("register", sig)
    args = jvm.java.lang.reflect.Array.newInstance(
        jvm.java.lang.Class.forName("java.lang.Object"), 4
    )
    for i, v in enumerate(
        (
            jvm.java.lang.Long(int(ts_id)),
            jvm.java.lang.Long(int(value_id)),
            jvm.java.lang.Long(int(gran_ms)),
            jplan,
        )
    ):
        jvm.java.lang.reflect.Array.set(args, i, v)
    m.invoke(None, args)

    if state is None:
        empty_sig = jvm.java.lang.reflect.Array.newInstance(
            jvm.java.lang.Class.forName("java.lang.Class"), 0
        )
        empty_args = jvm.java.lang.reflect.Array.newInstance(
            jvm.java.lang.Class.forName("java.lang.Object"), 0
        )
        rule = cls.getDeclaredConstructor(empty_sig).newInstance(empty_args)
        exp = spark._jsparkSession.experimental()
        prior = exp.extraOptimizations()  # preserve foreign rules
        existing = []
        pit = prior.iterator()
        while pit.hasNext():
            existing.append(pit.next())
        seq = spark.sparkContext._jvm.PythonUtils.toSeq(
            existing + [rule]
        )
        getattr(exp, "extraOptimizations_$eq")(seq)
        _STATE[key] = (cls, rule, prior)
    return cls


def uninstall(spark: SparkSession, cls=None) -> None:
    """Remove the injected rule and its registrations; foreign
    extraOptimizations that predated install() are restored."""
    if cls is not None:
        cls.getMethod(
            "clear",
            spark._jvm.java.lang.reflect.Array.newInstance(
                spark._jvm.java.lang.Class.forName("java.lang.Class"), 0
            ),
        ).invoke(
            None,
            spark._jvm.java.lang.reflect.Array.newInstance(
                spark._jvm.java.lang.Class.forName("java.lang.Object"), 0
            ),
        )
    key = id(spark.sparkContext._gateway)
    state = _STATE.pop(key, None)
    exp = spark._jsparkSession.experimental()
    if state is not None:
        getattr(exp, "extraOptimizations_$eq")(state[2])
    else:
        getattr(exp, "extraOptimizations_$eq")(
            spark.sparkContext._jvm.PythonUtils.toSeq([])
        )
